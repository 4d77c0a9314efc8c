"""dgraphpandas_spark — PySpark-native knowledge-graph construction engine
with the semantics of kiran94/dgraphpandas (reference read-only at
/root/reference), re-expressed Spark-first: DataFrame/Catalyst expressions
end-to-end, Arrow-vectorized escape hatches only where pandas lexical parity
demands it.  See SURVEY.md for the operator inventory this covers.
"""
from .config import get_from_config, load_config
from .operators.horizontal import horizontal_transform
from .operators.vertical import vertical_transform
from .session import get_spark
from .writers.upserts import generate_upserts

__version__ = '0.1.0'

__all__ = [
    'get_from_config',
    'load_config',
    'horizontal_transform',
    'vertical_transform',
    'generate_upserts',
    'get_spark',
]
