from bdm_tpu.utils.io import write_ply, read_ply

__all__ = ["write_ply", "read_ply"]
