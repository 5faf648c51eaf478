"""Streaming-prover scale driver: prove a 2^N-row trace on one chip
with bounded HBM, recording wall time and device memory stats."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["ZKIR_PROVE_LOG"] = "1"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zkir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from zkir_tpu.prover import verify_trace
from zkir_tpu.prover.benchtrace import exact_trace_matrix
from zkir_tpu.prover.fri import FriConfig
from zkir_tpu.prover.streaming import prove_trace_streaming

LOG = int(os.environ.get("STREAM_LOG_ROWS", "20"))
t0 = time.time()
matrix = exact_trace_matrix(LOG, chunk=4096)
print(f"trace built: {matrix.shape} in {time.time()-t0:.1f}s", flush=True)
dev = jax.devices()[0]
def hbm():
    try:
        st = dev.memory_stats()
        return {k: st.get(k) for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception as e:
        return {"err": str(e)}
print("hbm before:", hbm(), flush=True)
t0 = time.time()
proof = prove_trace_streaming(matrix, FriConfig(), col_block=64)
dt = time.time() - t0
print(f"STREAM PROVE 2^{LOG}: {dt:.1f}s = {matrix.shape[0]/dt:.0f} rows/s", flush=True)
print("hbm after:", hbm(), flush=True)
t0 = time.time()
ok = verify_trace(proof)
print("verified:", ok, f"in {time.time()-t0:.1f}s", flush=True)
