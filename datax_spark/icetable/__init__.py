from datax_spark.icetable.table import IceTable, TableCommitConflict  # noqa: F401
