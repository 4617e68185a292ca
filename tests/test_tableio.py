"""TableIO seam: parquet fallback against real files, and the Iceberg
catalog branch's ROUTING contract (spark.read.table / writeTo /
tableExists with catalog-qualified names) verified against recording
fakes — the sandbox has no Iceberg runtime jars, so the catalog branch
cannot execute end-to-end here.  On a real cluster it needs
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` plus
``spark.sql.catalog.<name>`` conf; this test pins the seam's behavior
so wiring those jars is the ONLY remaining step."""

from __future__ import annotations

from timeseriescorrelation_spark.sources.tableio import TableIO


class _FakeConf:
    def __init__(self, conf):
        self._conf = conf

    def get(self, key, default=None):
        return self._conf.get(key, default)


class _FakeReader:
    def __init__(self, log):
        self._log = log

    def table(self, name):
        self._log.append(("read.table", name))
        return f"df:{name}"

    def parquet(self, path):
        self._log.append(("read.parquet", path))
        return f"df:{path}"


class _FakeCatalog:
    def __init__(self, log):
        self._log = log

    def tableExists(self, name):
        self._log.append(("tableExists", name))
        return True


class _FakeSpark:
    def __init__(self, conf):
        self.log = []
        self.conf = _FakeConf(conf)
        self.read = _FakeReader(self.log)
        self.catalog = _FakeCatalog(self.log)


class _FakeWriteTo:
    def __init__(self, log, name):
        self._log = log
        self._name = name

    def createOrReplace(self):
        self._log.append(("writeTo.createOrReplace", self._name))

    def append(self):
        self._log.append(("writeTo.append", self._name))


class _FakeDF:
    def __init__(self, log):
        self._log = log

    def writeTo(self, name):
        return _FakeWriteTo(self._log, name)


def test_catalog_branch_routes_through_catalog():
    spark = _FakeSpark({"spark.sql.catalog.ice": "org.example.IceCatalog"})
    io = TableIO(spark, root="/nonexistent", catalog="ice")
    assert io.use_catalog

    assert io.read("transcripts") == "df:ice.transcripts"
    io.write(_FakeDF(spark.log), "tier_1m", mode="overwrite")
    io.write(_FakeDF(spark.log), "tier_1m", mode="append")
    assert io.exists("tier_1m")
    assert spark.log == [
        ("read.table", "ice.transcripts"),
        ("writeTo.createOrReplace", "ice.tier_1m"),
        ("writeTo.append", "ice.tier_1m"),
        ("tableExists", "ice.tier_1m"),
    ]


def test_unconfigured_catalog_falls_back_to_parquet():
    spark = _FakeSpark({})
    io = TableIO(spark, root="/data/sf", catalog="ice")
    assert not io.use_catalog
    assert io.read("events") == "df:/data/sf/events"
    assert spark.log == [("read.parquet", "/data/sf/events")]


def test_parquet_fallback_reads_real_files(spark):
    io = TableIO(spark, root="/root/testdata/sf0.001")
    assert io.exists("events")
    assert not io.exists("no_such_table")
    df = io.read("events")
    assert df.count() > 0 and "event_id" in df.columns


def test_parquet_roundtrip_write(spark, tmp_path):
    io = TableIO(spark, root=str(tmp_path))
    from pyspark.sql import functions as F

    src = spark.range(10).select(
        F.col("id").alias("conv_id"), (F.col("id") * 2.0).alias("value")
    )
    io.write(src, "out_table", partition_by=["conv_id"])
    assert io.exists("out_table")
    assert io.read("out_table").count() == 10
