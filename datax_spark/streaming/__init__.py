from datax_spark.streaming.driver import EpochDriver  # noqa: F401
from datax_spark.streaming.source import ChangeTailSource  # noqa: F401
