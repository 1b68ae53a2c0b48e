from aqp_tpu.ops import hashing, scan, partition, segops

__all__ = ["hashing", "scan", "partition", "segops"]
