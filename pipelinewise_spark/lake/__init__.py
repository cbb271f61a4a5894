from pipelinewise_spark.lake.table import CommitConflict, LakeTable

__all__ = ["LakeTable", "CommitConflict"]
