from pienerf_tpu.io.ply import read_ply, write_ply  # noqa: F401
