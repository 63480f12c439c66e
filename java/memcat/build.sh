#!/bin/sh
# Rebuild flowbyte_spark/jars/flowbyte-memcat.jar from source.
# Requires JDK 17 and an installed pyspark (the Spark jars are the compile
# classpath).  The built jar is checked in so test environments without a
# JDK still get the catalog.
set -e
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
# Clean first: a stale class from a renamed/deleted source would
# otherwise ride along into the jar, making the committed binary not a
# reproducible artifact of the committed source.
rm -rf build
mkdir -p build
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d build src/flowbyte/memcat/MemoryCatalog.java
jar cf ../../flowbyte_spark/jars/flowbyte-memcat.jar -C build .
echo "built ../../flowbyte_spark/jars/flowbyte-memcat.jar"
