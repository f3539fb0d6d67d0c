from datax_spark.operators.lww import lww_resolve  # noqa: F401
from datax_spark.operators.merge import apply_epoch  # noqa: F401
from datax_spark.operators.quarantine import split_dirty  # noqa: F401
