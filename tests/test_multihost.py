"""Multi-host (DCN) tier: localhost process-group dryrun (SURVEY.md
section 5 distributed row; VERDICT round-1 item 6).

Spawns REAL OS processes joined via jax.distributed, decodes over the
global (cross-process) mesh, and checks the result against the
single-process decode — the no-cluster validation of the multi-host path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.sharding.multihost import launch_localhost_dryrun


@pytest.mark.slow
def test_localhost_process_group_decode(small_cfg):
    records = launch_localhost_dryrun(num_processes=2,
                                      devices_per_process=2, port=12791)
    assert len(records) == 2
    assert all(r["finite"] for r in records)
    assert records[0]["checksum"] == records[1]["checksum"]
    assert all(r["devices"] == 4 for r in records)

    # cross-check against the same decode in THIS (single) process
    from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
    from hdrvae.models.decoder import init_decoder
    from hdrvae.sharding.mesh import make_mesh, sharded_slab_decode
    cfg = DecoderConfig().with_small()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    latent = jax.random.normal(jax.random.PRNGKey(1),
                               (1, 16, 16, cfg.z_channels), jnp.float32)
    result = sharded_slab_decode(params, latent, cfg, HDRDecodeConfig(),
                                 mesh=make_mesh(num_devices=4),
                                 precision=Precision.parity())
    ref = float(jnp.sum(result.image))
    np.testing.assert_allclose(records[0]["checksum"], ref, rtol=1e-5)
