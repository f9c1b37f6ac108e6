from raft_c_spark.plans.registry import all_queries, all_oracles  # noqa: F401
