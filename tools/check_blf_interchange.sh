#!/bin/bash
# Cross-TOOL bloom-file interchange check: build the reference C binary
# (vladkens/ecloop) from $REF_SRC, generate a .blf with EACH tool from
# the same input, and require (a) byte-identical files, (b) each tool's
# blf-check accepts the other's file.  This is the strongest ECBF v1
# compatibility evidence available without a network: same sizing
# formula, same k=20 probe scheme, same on-disk layout.
set -eu
cd "$(dirname "$0")/.."
REF_SRC=${REF_SRC:-/root/reference}
WORK=${WORK:-/tmp/blf-interop}
rm -rf "$WORK" && mkdir -p "$WORK/ref"
cp -r "$REF_SRC"/main.c "$REF_SRC"/lib "$WORK/ref/"
( cd "$WORK/ref" && cc -O2 -o ecloop main.c -lm -lpthread 2>/dev/null )
REF="$WORK/ref/ecloop"

cat data/btc-puzzles-hash | python -m ecloop_tpu blf-gen -n 1024 \
  -o "$WORK/ours.blf" > /dev/null
cat data/btc-puzzles-hash | "$REF" blf-gen -n 1024 \
  -o "$WORK/theirs.blf" > /dev/null

cmp "$WORK/ours.blf" "$WORK/theirs.blf" \
  && echo "blf files BYTE-IDENTICAL ($(stat -c%s "$WORK/ours.blf") bytes)"

n_ref=$(cat data/btc-puzzles-hash | "$REF" blf-check -f "$WORK/ours.blf" \
        | grep -c " FOUND")
n_our=$(cat data/btc-puzzles-hash | python -m ecloop_tpu blf-check \
        -f "$WORK/theirs.blf" | grep -c " FOUND")
miss_ref=$(echo 0000000000000000000000000000000000000000 | "$REF" blf-check \
        -f "$WORK/ours.blf" | grep -c "NOT FOUND")
miss_our=$(echo 0000000000000000000000000000000000000000 | python -m \
        ecloop_tpu blf-check -f "$WORK/theirs.blf" | grep -c "NOT FOUND")
total=$(grep -c . data/btc-puzzles-hash)
echo "reference reads ours:  $n_ref/$total FOUND, negative probe: $miss_ref"
echo "ours reads reference:  $n_our/$total FOUND, negative probe: $miss_our"
[ "$n_ref" = "$total" ] && [ "$n_our" = "$total" ] \
  && [ "$miss_ref" = 1 ] && [ "$miss_our" = 1 ] \
  && echo "INTERCHANGE OK"
