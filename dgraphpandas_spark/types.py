"""Type maps: user/pandas dtype names -> RDF literal types / Dgraph schema
types / Spark SQL types.

Reference parity: /root/reference/dgraphpandas/types.py:8-72
(``_str_to_rdf_types``, ``_str_to_dgraph_type``, env-overridable defaults).
The Spark column additions are ours (used by the cast stage C1 and the
lexical renderer).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import types as T

DEFAULT_RDF_TYPE = os.environ.get('DEFAULT_RDF_TYPE', '<xs:string>')
DEFAULT_DGRAPH_TYPE = os.environ.get('DEFAULT_DGRAPH_TYPE', 'string')

# user-facing dtype name -> RDF literal type (reference types.py:12-28)
STR_TO_RDF_TYPES: Dict[str, str] = {
    'string': '<xs:string>',
    'object': '<xs:string>',
    'O': '<xs:string>',
    'int': '<xs:int>',
    'int32': '<xs:int>',
    'int64': '<xs:int>',
    'Int64': '<xs:int>',
    'float': '<xs:float>',
    'float32': '<xs:float>',
    'float64': '<xs:float>',
    'datetime64': '<xs:dateTime>',
    'datetime64[ns]': '<xs:dateTime>',  # pandas-2 spelling (SURVEY §5 landmine)
    'datetime': '<xs:dateTime>',
    '<M8[ns]': '<xs:dateTime>',
    'bool': '<xs:boolean>',
    'boolean': '<xs:boolean>',
}

# user-facing dtype name -> Dgraph schema type (reference types.py:30-46)
STR_TO_DGRAPH_TYPES: Dict[str, str] = {
    'string': 'string',
    'object': 'string',
    'O': 'string',
    'int': 'int',
    'int32': 'int',
    'int64': 'int',
    'Int64': 'int',
    'float': 'float',
    'float32': 'float',
    'float64': 'float',
    'datetime64': 'dateTime',
    'datetime64[ns]': 'dateTime',
    'datetime': 'dateTime',
    '<M8[ns]': 'dateTime',
    'bool': 'bool',
    'boolean': 'bool',
}

# user-facing dtype name -> Spark SQL type for the C1 cast stage
# (reference horizontal.py:67-79 does ``astype``; we ``cast``).
STR_TO_SPARK_TYPES: Dict[str, T.DataType] = {
    'string': T.StringType(),
    'object': T.StringType(),
    'O': T.StringType(),
    'int': T.LongType(),
    'int32': T.IntegerType(),
    'int64': T.LongType(),
    'Int64': T.LongType(),
    'float': T.DoubleType(),
    'float32': T.FloatType(),
    'float64': T.DoubleType(),
    'datetime64': T.TimestampType(),
    'datetime64[ns]': T.TimestampType(),
    'datetime': T.TimestampType(),
    '<M8[ns]': T.TimestampType(),
    'bool': T.BooleanType(),
    'boolean': T.BooleanType(),
}

_DATETIME_NAMES = {'datetime64', 'datetime64[ns]', 'datetime', '<M8[ns]'}


def is_datetime_type_name(name: str) -> bool:
    return name in _DATETIME_NAMES


def find_rdf_types(types: Dict[str, str]) -> Dict[str, str]:
    """column -> RDF type with default fallback (reference types.py:49-59)."""
    if types is None:
        raise ValueError('types')
    return {col: STR_TO_RDF_TYPES.get(t, DEFAULT_RDF_TYPE) for col, t in types.items()}


def find_dgraph_types(types: Dict[str, str]) -> Dict[str, str]:
    """column -> Dgraph type with default fallback (reference types.py:62-72)."""
    if types is None:
        raise ValueError('types')
    return {col: STR_TO_DGRAPH_TYPES.get(t, DEFAULT_DGRAPH_TYPE) for col, t in types.items()}


def find_spark_type(name: str) -> Optional[T.DataType]:
    return STR_TO_SPARK_TYPES.get(name)
