# Test/ops targets mirroring the reference's Makefile (reference
# Makefile:26-73): golden end-to-end vectors, bloom round-trip, verify,
# bench, and puzzle presets. ECLOOP defaults to the local launcher.

ECLOOP ?= python3 -m ecloop_tpu
PYTEST ?= python3 -m pytest

.PHONY: test test-all add mul rnd blf verify bench bench-gtable clean native

test:
	$(PYTEST) tests/ -x -q

# everything the default run gates off: sharded-engine parity (10+
# min/core each), the 2-process jax.distributed test, and the
# TPU-production graph forms forced on CPU
test-all:
	ECLOOP_RUN_SLOW=1 ECLOOP_TEST_MULTIHOST=1 $(PYTEST) tests/ -x -q

# reference `make add`: must find 9 keys over 16,777,216 checked
add:
	$(ECLOOP) add -f data/btc-puzzles-hash -t 1 -r 8000:ffffff

# reference `make mul`: must find 1080 keys (540 addr33 + 540 addr65)
mul:
	cat data/btc-bw-priv | $(ECLOOP) mul -f data/btc-bw-hash -t 1 -a cu

rnd:
	$(ECLOOP) rnd -f data/btc-puzzles-hash -t 1 -r 8000:ffffff -d 0:20

# bloom filter round-trip over both datasets (reference Makefile:35-44)
blf:
	rm -f /tmp/ecloop-test.blf
	cat data/btc-puzzles-hash data/btc-bw-hash | $(ECLOOP) blf-gen -n 32768 -o /tmp/ecloop-test.blf
	$(ECLOOP) add -f /tmp/ecloop-test.blf -t 1 -r 8000:ffffff
	cat data/btc-bw-priv | $(ECLOOP) mul -f /tmp/ecloop-test.blf -t 1 -a cu

verify:
	$(ECLOOP) mult-verify

bench:
	$(ECLOOP) bench

bench-gtable:
	$(ECLOOP) bench-gtable

native:
	$(MAKE) -C native

# remote one-shot execution (reference Makefile:77-101): rsync the tree
# to a host and run a make target there.  For coordinated multi-host
# searches prefer the jax.distributed launch (ECLOOP_COORDINATOR=...,
# see ecloop_tpu/parallel/multihost.py) — it splits ranges automatically.
#   make remote host=user@box cmd="make add"
remote:
	rsync -az --exclude .git --exclude __pycache__ --exclude .pytest_cache \
		. $(host):/tmp/ecloop-tpu
	ssh $(host) "cd /tmp/ecloop-tpu && $(cmd)"

clean:
	rm -rf __pycache__ ecloop_tpu/__pycache__ tests/__pycache__ .pytest_cache
	$(MAKE) -C native clean 2>/dev/null || true

# --- puzzle presets (reference Makefile:52-73) ---------------------------------
define PUZZLE
.PHONY: $(1)
$(1):
	$(ECLOOP) rnd -f data/btc-puzzles-hash -d 0:32 -r $(2) -o found_$(1).txt
endef

$(eval $(call PUZZLE,28,8000000:fffffff))
$(eval $(call PUZZLE,32,80000000:ffffffff))
$(eval $(call PUZZLE,33,100000000:1ffffffff))
$(eval $(call PUZZLE,34,200000000:3ffffffff))
$(eval $(call PUZZLE,35,400000000:7ffffffff))
$(eval $(call PUZZLE,36,800000000:fffffffff))
$(eval $(call PUZZLE,71,400000000000000000:7fffffffffffffffff))
$(eval $(call PUZZLE,72,800000000000000000:ffffffffffffffffff))
$(eval $(call PUZZLE,73,1000000000000000000:1ffffffffffffffffff))
$(eval $(call PUZZLE,74,2000000000000000000:3ffffffffffffffffff))
$(eval $(call PUZZLE,76,8000000000000000000:fffffffffffffffffff))
$(eval $(call PUZZLE,77,10000000000000000000:1fffffffffffffffffff))
$(eval $(call PUZZLE,78,20000000000000000000:3fffffffffffffffffff))
$(eval $(call PUZZLE,79,40000000000000000000:7fffffffffffffffffff))
