"""Multi-chip scaling layer: mesh construction + sharded scheme services."""

from dilithium_tpu.parallel.mesh import make_mesh, local_batch_to_global
from dilithium_tpu.parallel.service import (
    sharded_keygen, sharded_sign, sharded_sign_stream,
    sharded_sign_stream_keys, sharded_verify, sharded_verify_stream,
    throughput_counters,
)

__all__ = [
    "make_mesh", "local_batch_to_global",
    "sharded_keygen", "sharded_sign", "sharded_sign_stream",
    "sharded_sign_stream_keys", "sharded_verify",
    "sharded_verify_stream", "throughput_counters",
]
