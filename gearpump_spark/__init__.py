"""gearpump_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gearpump/gearpump (Apache Gearpump), plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design stance (SURVEY.md §7): this is a *library* on top of the PySpark
DataFrame / SQL / Structured Streaming API. The reference's execution
machinery (actors, netty transport, kryo, clock service, checkpoint
protocol) maps onto Spark built-ins; our code is the API surface, the
operator semantics, and the tests.

Reference parity map: see SURVEY.md §2 — every reference operator
(partitioners, sources/sinks, windowed monoid state, Beam translator set,
example workloads) has a Spark-first equivalent in this package.
"""

from gearpump_spark.session import get_spark, ensure_runtime_conf
from gearpump_spark.datasets import table, TABLES
from gearpump_spark.stream import GearContext, Stream

__all__ = [
    "get_spark",
    "ensure_runtime_conf",
    "table",
    "TABLES",
    "GearContext",
    "Stream",
]

__version__ = "0.1.0"
