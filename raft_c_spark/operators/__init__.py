from raft_c_spark.operators import tsdb  # noqa: F401
