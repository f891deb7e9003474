from wisp_tpu.ops.sdf.metrics import compute_sdf_iou, compute_sparse_sdf_iou
