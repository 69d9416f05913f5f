from distributed_system_mapreduce_spark.engine.maple_juice import MapleJuice  # noqa: F401
