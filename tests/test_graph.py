"""Graph-executor tests: run a decode -> export workflow end to end the way
ComfyUI's executor would run the reference pack."""

import json
import os

import numpy as np
import pytest

from hdrvae.api.graph import GraphError, GraphExecutor
from hdrvae.api.vae import VAE


@pytest.fixture()
def vae(small_cfg):
    return VAE.random_init(seed=4, config=small_cfg)


def _workflow(tmp_path):
    return {
        "nodes": [
            {"id": 1, "type": "HDRVAEDecode",
             "inputs": {"samples": ["latent_in", 0], "vae": ["vae_in", 0]},
             "widgets_values": ["conservative", 1.5]},
            {"id": 2, "type": "LinearEXRExport",
             "inputs": {"hdr_image": [1, 0]},
             "widgets_values": {"filename_prefix": "graphtest",
                                "output_path": str(tmp_path),
                                "format": "exr", "bit_depth": "32bit",
                                "compression": "zip",
                                "save_workflow": True}},
        ],
    }


def test_decode_export_workflow(tmp_path, monkeypatch, vae, small_cfg, rng):
    monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
    latent = rng.standard_normal(
        (1, 4, 4, small_cfg.z_channels)).astype(np.float32) * 2
    ex = GraphExecutor(external_inputs={
        "latent_in": ({"samples": latent},),
        "vae_in": (vae,),
    })
    results = ex.run(_workflow(tmp_path),
                     hidden={"PROMPT": {"p": 1},
                             "EXTRA_PNGINFO": {"workflow": {}}})
    image = results[1][0]
    scale = small_cfg.spatial_scale
    assert image.shape == (1, 4 * scale, 4 * scale, 3)
    path = results[2][0]
    assert os.path.exists(path)
    # widget list mapped positionally: conservative mode, ev 1.5
    from hdrvae.io import exr
    assert exr.read_exr(path).shape == (4 * scale, 4 * scale, 3)
    # sidecar workflow written via hidden inputs
    assert os.path.exists(os.path.splitext(path)[0] + ".json")


def test_example_workflow_satisfiable(tmp_path):
    """Node types + widget names in the shipped example resolve against the
    registry contracts."""
    import hdrvae
    wf = json.load(open("workflow_examples/hdr_decode_export.json"))
    for node in wf["nodes"]:
        cls = hdrvae.NODE_CLASS_MAPPINGS[node["type"]]
        it = cls.INPUT_TYPES()
        all_names = set(it.get("required", {})) | set(
            it.get("optional", {}))
        widgets = node.get("widgets_values")
        if isinstance(widgets, dict):
            assert set(widgets) <= all_names, node["type"]


def test_unknown_node_type(tmp_path):
    ex = GraphExecutor()
    with pytest.raises(GraphError, match="unknown node type"):
        ex.run({"nodes": [{"id": 1, "type": "Bogus", "inputs": {}}]})


def test_cycle_detection():
    ex = GraphExecutor()
    wf = {"nodes": [
        {"id": 1, "type": "HDRVAEDecode",
         "inputs": {"samples": [2, 0], "vae": [2, 0]}},
        {"id": 2, "type": "HDRVAEDecode",
         "inputs": {"samples": [1, 0], "vae": [1, 0]}},
    ]}
    with pytest.raises(GraphError, match="cycle"):
        ex.run(wf)


def test_missing_external(tmp_path):
    ex = GraphExecutor()
    wf = {"nodes": [{"id": 1, "type": "HDRVAEDecode",
                     "inputs": {"samples": ["nope", 0],
                                "vae": ["nope", 0]}}]}
    with pytest.raises(GraphError, match="neither a node id nor"):
        ex.run(wf)
