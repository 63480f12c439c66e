"""flowbyte-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the ``flowbyte`` reference library
(/root/reference), re-designed Spark-first.

Public surface:
- :mod:`flowbyte_spark.session` — SparkSession factory (Arrow, AQE, UTC).
- :mod:`flowbyte_spark.catalog` — fixture/table registration.
- :mod:`flowbyte_spark.sources` — readers/writers (files, JDBC, REST hooks).
- :mod:`flowbyte_spark.operators` — Tier-A mutation ops (append, keyed
  merge, truncate/delete), casts, as-of joins, dedup, similarity, text.
- :mod:`flowbyte_spark.functions` — Catalyst expression helpers.
- :mod:`flowbyte_spark.streaming` — Structured Streaming operators.
- :mod:`flowbyte_spark.queries` — the verification-query registry.
"""

from flowbyte_spark.session import configure, get_spark  # noqa: F401
from flowbyte_spark.catalog import load_table, register_tables  # noqa: F401

__version__ = "0.1.0"
