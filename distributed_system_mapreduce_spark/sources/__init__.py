from distributed_system_mapreduce_spark.sources.filestore import FileStore  # noqa: F401
