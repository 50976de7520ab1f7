#!/usr/bin/env bash
# run_mkindex
# TPU-native equivalent of /root/reference/examples/run_mkindex.sh.
# Canonical parameters per the reference script; paths follow the reference
# data layout (setup_env.sh). For a filesystem-free smoke run append:
#   -synthetic 0 -nb 200000 -nt 100000 -nq 1000
set -eu
cd "$(dirname "$0")/.."

data="${PWD}/data/SIFT1B"
model="${PWD}/models/SIFT1B"
mkdir -p "$model"

python -m ivfhnsw_tpu.drivers.mkindex \
  -M 16 -efConstruction 500 \
  -nb 1000000000 -nt 10000000 -nsubt 262144 -nc 993127 -nq 10000 -ngt 1000 -d 128 \
  -code_size 16 -do_opq on -nsubc 64 \
  -k 1 -nprobe 64 -max_codes 30000 -efSearch 100 -do_pruning off \
  -path_base "$data/bigann_base.bvecs" -path_learn "$data/bigann_learn.bvecs" \
  -path_q "$data/bigann_query.bvecs" -path_gt "$data/gnd/idx_1000M.ivecs" \
  -path_centroids "$data/centroids_sift1b.fvecs" -path_precomputed_idxs "$data/precomputed_idxs_sift1b.ivecs" \
  -path_pq "$model/pq16_opq_g64.pq" -path_norm_pq "$model/norm_pq16_opq_g64.pq" \
  -path_opq_matrix "$model/opq16.opq" \
  -path_index "$model/ivfhnsw_PQ16_opq_g64.index" -orcv_home "$model/orcv_home" "$@"
