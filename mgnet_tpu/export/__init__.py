from mgnet_tpu.export.aot import (
    export_fused_inference,
    load_exported,
    save_exported,
)

__all__ = ["export_fused_inference", "save_exported", "load_exported"]
