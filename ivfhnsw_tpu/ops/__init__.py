from ivfhnsw_tpu.ops import distances, topk, kmeans, pq, opq  # noqa: F401
