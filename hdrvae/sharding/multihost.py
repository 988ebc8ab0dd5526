"""Multi-host (DCN) execution support.

The reference is strictly single-device (SURVEY.md section 5, distributed
row: manual CUDA placement at `hdr_vae_decode.py:452-502` is its only
"placement" code).  The single-host path here shards slabs over ICI
(hdrvae.sharding.mesh); this module adds the multi-HOST tier the survey
named as the "if multi-host later" path: ``jax.distributed`` process
groups whose mesh spans hosts, with the same slab executor riding the
inter-host network (DCN) for its GN psums.

Design: the slab decode is SPMD — every process runs the identical
program on the global mesh; only array shards differ.  Processes
therefore need exactly three things: (1) ``initialize()`` the process
group, (2) build the global mesh (``mesh.make_mesh`` already uses
``jax.devices()``, which is global after initialize), (3) provide inputs
replicated (identical on every host).  Everything else — collectives over
ICI within a host and DCN across hosts — is XLA's job.

``launch_localhost_dryrun`` is the no-cluster validation harness
(SURVEY.md section 4e analog for DCN): it spawns N real OS processes on
localhost, each with its own CPU devices, and checks they produce the
same decode a single process does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import List, Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_ids: Optional[List[int]] = None) -> None:
    """Join the jax.distributed process group (idempotent per process).

    Call before ANY device use.  After this, ``jax.devices()`` spans all
    hosts and hdrvae's mesh/slab executors work unchanged.
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def _worker_main(argv: List[str]) -> int:
    """Entry for one dryrun process (spawned by launch_localhost_dryrun)."""
    coordinator, num_processes, process_id, devs = (
        argv[0], int(argv[1]), int(argv[2]), int(argv[3]))

    # Force CPU with `devs` virtual devices BEFORE jax initializes; the
    # ambient axon sitecustomize would otherwise claim the one real TPU in
    # every process.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={devs}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    initialize(coordinator, num_processes, process_id)

    import jax.numpy as jnp
    from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
    from hdrvae.models.decoder import init_decoder
    from hdrvae.sharding.mesh import make_mesh, sharded_slab_decode

    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * devs

    cfg = DecoderConfig().with_small()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16,
                                                       cfg.z_channels),
                               jnp.float32)

    mesh = make_mesh()  # global: all devices across all processes
    result = sharded_slab_decode(params, latent, cfg, HDRDecodeConfig(),
                                 mesh=mesh, precision=Precision.parity())
    # fully-replicated reductions are fetchable on every process
    checksum = float(jnp.sum(result.image))
    finite = bool(jnp.isfinite(result.image).all())
    print(json.dumps({"process": process_id,
                      "devices": jax.device_count(),
                      "checksum": checksum, "finite": finite}), flush=True)
    return 0


def launch_localhost_dryrun(num_processes: int = 2,
                            devices_per_process: int = 2,
                            port: int = 0,
                            timeout: float = 600.0) -> List[dict]:
    """Spawn a localhost process group and slab-decode across it.

    ``port`` 0 asks the OS for a free coordinator port (a fixed default
    collides across concurrent/rapidly-repeated runs — TIME_WAIT flakes).

    Returns the per-process result records (checksum must agree across
    processes — they hold the same replicated output).
    """
    if port == 0:
        import socket
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # children must not grab the TPU
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "hdrvae.sharding.multihost",
             f"localhost:{port}", str(num_processes), str(pid),
             str(devices_per_process)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))

    records = []
    errors = []
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, err = proc.communicate()
            errors.append(f"process {pid} timed out\n{err[-2000:]}")
            continue
        if proc.returncode != 0:
            errors.append(f"process {pid} rc={proc.returncode}\n"
                          f"{err[-2000:]}")
            continue
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                records.append(json.loads(line))
    if errors:
        raise RuntimeError("multihost dryrun failed:\n" + "\n".join(errors))

    checksums = [r["checksum"] for r in records]
    if len(records) != num_processes:
        raise RuntimeError(f"expected {num_processes} records, got "
                           f"{records}")
    if not all(r["finite"] for r in records):
        raise RuntimeError(f"non-finite decode: {records}")
    if not np.allclose(checksums, checksums[0], rtol=1e-6):
        raise RuntimeError(f"processes disagree: {checksums}")
    return records


if __name__ == "__main__":
    sys.exit(_worker_main(sys.argv[1:]))
