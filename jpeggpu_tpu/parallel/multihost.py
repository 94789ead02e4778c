"""Multi-host decode: jax.distributed wiring + a process-spanning mesh.

The reference is single-GPU single-process (CMakeLists.txt:50 links only
cudart); scaling out is this build's own axis. Decode is embarrassingly
data-parallel — per-image scan words, segment tables and Huffman/quant
tables all travel on the batch axis and the hot path needs **no cross-host
collectives** — so the multi-host story is wiring: initialize the
distributed runtime, build one mesh over every process's devices, stage
each host's local images as its shard of a global batch, and run the same
SPMD executable everywhere. Per-host results come back from the local
shards of the sharded outputs; nothing crosses DCN but the coordination
handshake.

Usage (same program on every host):

    from jpeggpu_tpu.parallel import multihost
    multihost.initialize(coordinator, num_processes, process_id)
    dec = multihost.MultiHostBatchDecoder()
    local_planes = dec.decode(local_jpegs)   # this host's images only

Weak-scaling harness: scripts/weakscale.py (multi-process over localhost).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..pipeline import PlanSignature, build_inputs, build_plan
from ..reader import parse


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    On TPU pods with a cluster environment the arguments are auto-detected;
    pass them explicitly for manual (e.g. localhost CPU) clusters.
    """
    import jax

    if getattr(initialize, "_done", False):
        return
    # NOTE: must run before anything initializes the XLA backend
    # (jax.devices(), any computation); callers initialize first.
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id, **kwargs)
    initialize._done = True


def global_mesh(axis_name: str = "data"):
    """One mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


class MultiHostBatchDecoder:
    """Data-parallel batched decode over a process-spanning mesh.

    Every process calls :meth:`decode` with its *local* images; all
    processes must participate with the same count of images of the same
    geometry bucket (the SPMD contract). Returns the local images' planes.
    """

    def __init__(self, mesh=None, with_idct: bool = True,
                 axis_name: str = "data"):
        import jax

        self.mesh = mesh if mesh is not None else global_mesh(axis_name)
        self.axis = self.mesh.axis_names[0]
        self.with_idct = with_idct
        self._exec_cache: Dict = {}
        self._nproc = jax.process_count()

    def _stage(self, local_stacked, batch_global: int):
        """Local per-process arrays -> global sharded arrays on the mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(self.axis))

        def put(x):
            x = np.asarray(x)
            global_shape = (batch_global,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)

        return jax.tree.map(put, local_stacked)

    def decode(self, local_datas: Sequence[bytes]) -> List[List[np.ndarray]]:
        import jax

        from .batch import _stack_merged_shards, _tables_shared

        if not local_datas:
            raise ValueError("each process must supply >= 1 image")
        plans = [build_plan(parse(d)) for d in local_datas]
        sig = plans[0].signature
        if any(p.signature != sig for p in plans):
            raise ValueError(
                "multi-host batch must share one geometry bucket; group "
                "images by signature before calling decode")
        inputs = [build_inputs(d, p) for d, p in zip(local_datas, plans)]
        n_real = len(local_datas)

        d_local = len([d for d in self.mesh.devices.flat
                       if d.process_index == jax.process_index()])

        # mixed per-host batch sizes: SPMD requires every process to build
        # the SAME executable, so each host pads its local batch up to the
        # global per-host maximum (rounded to a whole number of local
        # devices) by repeating its last image; only the real results are
        # returned. One tiny allgather of the counts per call.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(
                np.asarray([n_real], np.int32))
            target = int(np.max(counts))
            if d_local > 0:
                target = -(-target // d_local) * d_local
            inputs = inputs + [inputs[-1]] * (target - n_real)
        merged_ok = (
            d_local > 0 and len(inputs) % d_local == 0
            and all(sp.host_destuff for sp in sig.scans)
            and all(_tables_shared([bi["scans"][s] for bi in inputs])
                    for s in range(len(sig.scans))))
        if merged_ok:
            return self._decode_merged(sig, inputs, d_local, n_real)
        return self._decode_vmapped(sig, inputs, n_real)

    def _decode_merged(self, sig: PlanSignature, inputs, d_local: int,
                       n_local: int) -> List[List[np.ndarray]]:
        """Merged-lane shard_map path: each device decodes its k local
        images as one wide decode (the production batching formulation —
        the vmapped pipeline lowers batched scatters catastrophically)."""
        from .batch import _stack_merged_shards, mesh_merged_exec

        merged_stacked, qt_stacked, k = _stack_merged_shards(
            sig, inputs, d_local)
        d_global = self.mesh.devices.size
        dev_merged = self._stage(merged_stacked, d_global)
        dev_qt = self._stage(qt_stacked, d_global)

        key = (sig, k, self.with_idct, "mesh_merged")
        exe = self._exec_cache.get(key)
        if exe is None:
            exe = mesh_merged_exec(sig, self.mesh, dev_merged, dev_qt,
                                   self.with_idct)
            self._exec_cache[key] = exe
        out = exe(dev_merged, dev_qt)
        return self._collect_local(out, n_local, per_shard=k)

    def _decode_vmapped(self, sig: PlanSignature, inputs,
                        n_local: int) -> List[List[np.ndarray]]:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .batch import _stack
        from ..pipeline import decode_pipeline

        # padded local count (mixed per-host batches are padded to a
        # common size in decode(); n_local is the real count collected)
        batch_global = len(inputs) * self._nproc
        local_scans = [_stack([bi["scans"][s] for bi in inputs])
                       for s in range(len(sig.scans))]
        local_qt = np.stack([bi["qtables"] for bi in inputs])
        dev_scans = self._stage(local_scans, batch_global)
        dev_qt = self._stage(local_qt, batch_global)

        key = (sig, batch_global, self.with_idct)
        exe = self._exec_cache.get(key)
        if exe is None:
            shard = NamedSharding(self.mesh, P(self.axis))

            @partial(jax.jit, static_argnums=(0, 3),
                     out_shardings=shard)
            def _pipe(signature: PlanSignature, scans, qt, with_idct):
                fn = lambda s, q: decode_pipeline(signature, s, q, with_idct)
                return jax.vmap(fn)(scans, qt)

            exe = _pipe.lower(sig, dev_scans, dev_qt,
                              self.with_idct).compile()
            self._exec_cache[key] = exe
        out = exe(dev_scans, dev_qt)
        return self._collect_local(out, n_local)

    def _collect_local(self, out, n_local: int,
                       per_shard: int = 0) -> List[List[np.ndarray]]:
        """Pull this process's shard of every plane, in local image order.
        Merged outputs have shape (D, k, ...) per plane (per_shard=k);
        vmapped outputs (B, ...) (per_shard=0)."""
        results: List[List[np.ndarray]] = [[] for _ in range(n_local)]
        for plane in out:
            shards = sorted(plane.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            rows = np.concatenate([np.asarray(s.data) for s in shards])
            if per_shard:  # (D_local, k, H, W) -> (D_local*k, H, W)
                rows = rows.reshape((-1,) + rows.shape[2:])
            # rows may exceed n_local when this host's batch was padded to
            # the global per-host maximum (mixed counts); padded rows are
            # repeats of the last real image and are dropped here
            assert rows.shape[0] >= n_local, (rows.shape, n_local)
            for i in range(n_local):
                results[i].append(rows[i])
        return results
