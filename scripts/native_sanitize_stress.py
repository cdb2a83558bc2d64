"""jax-free native-library sanitizer stress (round 5).

Drives every C++ entry point family — threaded similarity batch, GT-label
sweep, greedy decode incl. the checkpoint/resume path, degenerate graphs,
edit-distance edge cases — WITHOUT importing jax, so the whole run works
under ASan/UBSan (jax/XLA itself trips ASan interceptors, which is why the
normal pytest suite cannot be sanitized wholesale).

Usage:
  g++ -O1 -g -march=native -fPIC -shared -std=c++17 -pthread \
      -fsanitize=address -fno-omit-frame-pointer \
      native/gnnome_native.cpp -o native/libgnnome.so
  LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
      ASAN_OPTIONS=detect_leaks=0:halt_on_error=1 python scripts/native_sanitize_stress.py
  # (same with -fsanitize=undefined / libubsan.so)
  sh native/build.sh   # restore the production build afterwards

ASan, TSan (-fsanitize=thread / libtsan.so) and UBSan all ran clean on 2026-08-20 (round 5).
"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from gnnome_tpu.native import get_lib
assert get_lib() is not None, "native lib failed to load"
from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
from gnnome_tpu.graphs.labels import compute_gt_labels
from gnnome_tpu.graphs.similarity import overlap_similarities
from gnnome_tpu.decode.greedy import decode_greedy
from gnnome_tpu.config import DecodeConfig

for seed in (0, 1, 2):
    g, reads, _, _ = synthetic_assembly_graph(
        n_reads=250, genome_len=20000, read_len=400, seed=seed,
        with_sequences=True, false_edge_frac=0.2)
    # similarity over the packed read store (threaded C++ aligner)
    sim = overlap_similarities(g.src, g.dst, g.overlap_length, reads,
                               n_threads=3)
    assert sim.shape == g.src.shape and np.isfinite(sim).all()
    y = compute_gt_labels(g.src, g.dst, g.read_strand, g.read_start,
                          g.read_end, g.read_chr)
    assert y.shape == g.src.shape
    # decode with random logits at two thresholds + label oracle
    rng = np.random.default_rng(seed)
    scores = rng.standard_normal(g.num_edges).astype(np.float32) * 3
    for cfgkw in ({}, {"len_threshold": 500}):
        r = decode_greedy(g, scores, DecodeConfig(**cfgkw), rng=np.random.default_rng(1))
    r2 = decode_greedy(g, y.astype(np.float32) * 10 - 5,
                       DecodeConfig(), rng=np.random.default_rng(1))
    # resume path: checkpoint mid-decode
    ckdir = tempfile.mkdtemp()
    r3 = decode_greedy(g, scores, DecodeConfig(), checkpoint_dir=ckdir,
                       rng=np.random.default_rng(2))
    r4 = decode_greedy(g, scores, DecodeConfig(), checkpoint_dir=ckdir,
                       rng=np.random.default_rng(2))
    print(f"seed {seed}: edges {g.num_edges} contig walks "
          f"{len(r.walks)}/{len(r2.walks)}/{len(r3.walks)}/{len(r4.walks)}")

# tiny/degenerate graphs
from gnnome_tpu.graphs.container import AssemblyGraph
g0 = AssemblyGraph(num_nodes=2, src=np.array([0], np.int32),
                   dst=np.array([1], np.int32),
                   read_length=np.array([100, 100], np.int64),
                   prefix_length=np.array([50], np.int64),
                   overlap_length=np.array([50], np.int64))
r = decode_greedy(g0, np.array([1.0], np.float32), DecodeConfig())
print("tiny graph ok:", len(r.walks))

# raw edit distance edge cases
lib = get_lib()
for a, b in ((b"", b""), (b"A", b""), (b"ACGT"*100, b"ACGT"*100),
             (b"A"*5000, b"C"*5000)):
    d = lib.gn_edit_distance(a, len(a), b, len(b))
    assert 0 <= d <= max(len(a), len(b))
print("edit distance edge cases ok")
print("ALL OK")
