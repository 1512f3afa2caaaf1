from spgpu_tpu.io.mm import MmProperties, read_mm, read_mm_properties, write_mm

__all__ = ["MmProperties", "read_mm", "read_mm_properties", "write_mm"]
