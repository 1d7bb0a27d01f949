"""python_openetl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference library ``tmccall8829/python-openetl``
(see SURVEY.md): snapshot seeding, incremental upsert + delete
propagation, flat-file ingestion, type normalization, plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Everything is expressed declaratively on the DataFrame/SQL API so that
Catalyst/Tungsten/AQE choose physical plans; Python touches data only
through Arrow-batched pandas UDFs on the few operators Spark's
built-ins cannot express.
"""

from python_openetl_spark.session import get_spark, tune_session
from python_openetl_spark.io import load_table, load_tables, register_views, TABLES
from python_openetl_spark.engine import Dataset, Engine
from python_openetl_spark.doctor import Capability, doctor

__version__ = "0.4.0"

__all__ = [
    "Engine",
    "Dataset",
    "get_spark",
    "tune_session",
    "load_table",
    "load_tables",
    "register_views",
    "TABLES",
]
