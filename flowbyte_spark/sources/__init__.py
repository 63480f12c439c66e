"""Sources & sinks: file formats, the SQL facade, JDBC, and REST hooks."""

from flowbyte_spark.sources.files import read_table, write_table  # noqa: F401
from flowbyte_spark.sources.sql_source import SparkSQLSource  # noqa: F401
