from .choice import ChoiceSampler  # noqa: F401
from .core import sample, SamplingResults  # noqa: F401
from .adaptive import sample_batch_adaptive, decide_batch  # noqa: F401
