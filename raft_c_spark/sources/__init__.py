from raft_c_spark.sources.testdata import load_table, load_tables, events_as_points  # noqa: F401
