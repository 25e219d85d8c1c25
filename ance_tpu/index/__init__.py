from ance_tpu.index.flat import FlatIPIndex, knn_inner_product, topk_inner_product
