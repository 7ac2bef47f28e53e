from beso_tpu.ops.flash_attention import flash_attention
