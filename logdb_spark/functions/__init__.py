from logdb_spark.functions.numeric import money, ratio
from logdb_spark.functions.temporal import ts_second, ts_str
from logdb_spark.functions.vector import cosine_sim, dot
from logdb_spark.functions.text import tokens

__all__ = ["money", "ratio", "ts_second", "ts_str", "dot", "cosine_sim", "tokens"]
