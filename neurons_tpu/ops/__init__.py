from neurons_tpu.ops.attention import dot_product_attention, flash_attention
