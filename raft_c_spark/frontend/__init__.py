from raft_c_spark.frontend.parser import parse  # noqa: F401
from raft_c_spark.frontend import ast  # noqa: F401
