from .scores import ScoreTables  # noqa: F401
from .engine import PairBatch, dp_fill, NEG_INF  # noqa: F401
