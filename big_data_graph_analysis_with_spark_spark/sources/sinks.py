"""Output sinks (SURVEY.md §2 rows S6, S7).

The reference dumps an *ordered* statistics map as YAML via SnakeYAML
with a LinkedHashMap shim (`HelperFunction.scala:375-409`), switching
between local and HDFS/S3 writers by master URL (`:390-401`).

Spark-first: stats are tiny driver-side aggregates, so the sink is a
plain ordered `yaml.dump`; URI dispatch goes through Spark's Hadoop
FileSystem (one code path for file://, hdfs://, s3a://) instead of a
hand-rolled branch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

import yaml


class _OrderedDumper(yaml.SafeDumper):
    pass


# preserve insertion order like the reference's LinkedHashMap shim
_OrderedDumper.add_representer(
    dict,
    lambda d, data: d.represent_mapping(
        "tag:yaml.org,2002:map", data.items(), flow_style=False
    ),
)


def stats_to_yaml(stats: dict[str, str]) -> str:
    return yaml.dump(stats, Dumper=_OrderedDumper, sort_keys=False)


def write_yaml_stats(
    spark: SparkSession, stats: dict[str, str], path: str
) -> None:
    """Write the stats map as YAML to `path` (any Hadoop-supported URI)."""
    payload = stats_to_yaml(stats)
    if "://" in path and not path.startswith("file:"):
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        out = fs.create(p, True)
        try:
            out.write(bytearray(payload, "utf-8"))
        finally:
            out.close()
    else:
        local = path.removeprefix("file:")
        with open(local, "w", encoding="utf-8") as f:
            f.write(payload)
