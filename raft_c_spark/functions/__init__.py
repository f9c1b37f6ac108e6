from raft_c_spark.functions.timefn import (  # noqa: F401
    NS_PER_UNIT,
    bucket_end,
    span_to_ns,
    to_ns,
)
