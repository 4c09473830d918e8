from s2r_tpu.parallel.feed import prefetch_to_device
