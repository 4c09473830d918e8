from s2r_tpu.ops.pallas.depthwise import depthwise_conv3x3
