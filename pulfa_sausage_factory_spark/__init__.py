"""pulfa_sausage_factory_spark — a PySpark-native engine providing the
query/data-processing capability surface of pulibrary/pulfa-sausage-factory
(see SURVEY.md for the operator inventory with reference citations), extended
with LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Everything is the DataFrame API: declarative plans that Catalyst optimizes
(predicate pushdown, column pruning, broadcast selection) and Tungsten
executes with whole-stage codegen. Python UDFs appear only at the
subprocess/C-library boundary (SURVEY.md §2.i) and are Arrow-batched.
"""

from pulfa_sausage_factory_spark.session import get_spark
from pulfa_sausage_factory_spark.io import load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
