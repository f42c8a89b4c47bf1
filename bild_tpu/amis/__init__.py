from .dirichlet import Dirichlet  # noqa: F401
from .cfc import CFC  # noqa: F401
from .sampler import FixedkSampler  # noqa: F401
