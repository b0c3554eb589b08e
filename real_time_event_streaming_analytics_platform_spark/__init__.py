"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference real-time event streaming analytics platform
(rohanadepu/Real-Time-Event-Streaming-Analytics-Platform), re-expressed
Spark-first: DataFrame/Spark SQL for the relational surface, Structured
Streaming for the streaming operators, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Import side effect: importing the top-level package registers every query
builder + oracle-SQL pair into :mod:`.plans.registry`.
"""

from .session import SessionFactory, get_spark
from .plans.registry import QUERIES, ORACLE

# Importing these modules populates the registry.
from .operators import reference as _reference  # noqa: F401  R-series
from .operators import relational as _relational  # noqa: F401  Q-series
from .functions import dedup as _dedup  # noqa: F401  north-star dedup
from .functions import similarity as _similarity  # noqa: F401  ANN
from .functions import text as _text  # noqa: F401  text analysis
from .functions import retrieval as _retrieval  # noqa: F401  BM25 + LM score
from .functions import multimodal as _multimodal  # noqa: F401
from .functions import pipeline as _pipeline  # noqa: F401  corpus assembly
from .functions import sketches as _sketches  # noqa: F401  mergeable HLL
from .functions import quality as _quality  # noqa: F401  data-quality checks
from .functions import vocab as _vocab  # noqa: F401  BPE vocab induction
from .functions import clustering as _clustering  # noqa: F401  k-means
from .functions import classifier as _classifier  # noqa: F401  quality LR
from .functions import langid as _langid  # noqa: F401  model lang-ID
from .streaming import entries as _streaming_entries  # noqa: F401

__all__ = ["SessionFactory", "get_spark", "QUERIES", "ORACLE"]
