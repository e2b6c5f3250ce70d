from .common import SearchConfig, Found, plan_claims  # noqa: F401
from .add import AddSearch  # noqa: F401
from .mul import MulSearch  # noqa: F401
from .rnd import RndSearch  # noqa: F401
