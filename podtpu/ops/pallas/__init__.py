from podtpu.ops.pallas.nms_kernel import pallas_greedy_suppress  # noqa: F401
