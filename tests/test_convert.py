"""Tests for the torch -> JAX weight converter (spi_tpu/convert.py).

No reference checkpoints ship with this environment, so the
persistence-pickle path is exercised against a SYNTHETIC pickle laid
out exactly like eg3d/torch_utils/persistence.py produces (a
`_reconstruct_persistent_obj(meta)` reduce call whose meta carries the
module __dict__ with _parameters/_buffers/_modules), and the plain
state_dict paths against real torch modules.
"""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spi_tpu import convert


def _fake_persistent_module(seed: int = 0):
    """Mimic a persistence-pickled module __dict__ (SURVEY.md §2.2:
    persistence stores raw module state)."""
    g = torch.Generator().manual_seed(seed)
    w = torch.randn(4, 3, generator=g)
    b = torch.zeros(4)
    child_state = {
        "_parameters": {"weight": torch.randn(2, 4, generator=g)},
        "_buffers": {"running_mean": torch.zeros(2)},
        "_modules": {},
    }

    class ChildStub:
        pass

    meta = {
        "type": "class",
        "class_name": "FakeGenerator",
        "state": {
            "_parameters": {"weight": w, "bias": b},
            "_buffers": {},
            "_modules": {
                "fc": convert._PersistentStub({"state": child_state}),
            },
            "init_kwargs": {"z_dim": 16, "c_dim": 25},
        },
    }
    return meta, {"weight": w, "bias": b}


def test_stub_unpickler_loads_persistence_layout(tmp_path):
    import sys
    import types

    meta, tensors = _fake_persistent_module()

    # Register a fake torch_utils.persistence module so pickling a
    # reference to _reconstruct_persistent_obj succeeds; the converter's
    # stub unpickler intercepts the name on LOAD, never importing it.
    mod = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):  # pragma: no cover
        return meta

    mod._reconstruct_persistent_obj = _reconstruct_persistent_obj
    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pkg = types.ModuleType("torch_utils")
    sys.modules["torch_utils"] = pkg
    sys.modules["torch_utils.persistence"] = mod
    try:

        class _PersistWrapper:
            def __init__(self, meta):
                self.meta = meta

            def __reduce__(self):
                return (_reconstruct_persistent_obj, (self.meta,))

        payload = {"G_ema": _PersistWrapper(meta)}
        path = tmp_path / "fake.pkl"
        with open(path, "wb") as f:
            torch.save(payload, f)
    finally:
        del sys.modules["torch_utils"]
        del sys.modules["torch_utils.persistence"]

    data = convert.load_persistence_pickle(str(path))
    g = data["G_ema"]
    assert isinstance(g, convert._PersistentStub)
    flat = {}
    convert._walk_module_state(g.state, "", flat)
    np.testing.assert_allclose(flat["weight"], tensors["weight"].numpy())
    assert flat["fc.weight"].shape == (2, 4)
    assert g.state["init_kwargs"]["z_dim"] == 16


def test_convert_state_dict_roundtrip(tmp_path):
    net = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3), torch.nn.BatchNorm2d(4), torch.nn.Linear(4, 2)
    )
    src = tmp_path / "net.pth"
    torch.save(net.state_dict(), src)
    out = convert.convert_state_dict(str(src), str(tmp_path / "net.npz"))
    assert "0.weight" in out
    assert "1.running_mean" in out
    assert "1.num_batches_tracked" not in out  # skipped suffix
    np.testing.assert_allclose(
        out["0.weight"], net.state_dict()["0.weight"].numpy(), rtol=1e-6
    )


def test_clip_convert_plain_statedict(tmp_path):
    # the clip converter accepts plain (non-torchscript) state dicts too
    sd = {
        "visual.conv1.weight": torch.randn(8, 3, 4, 4).half(),
        "logit_scale": torch.tensor(2.6592).half(),
        "visual.attn_mask": torch.zeros(4, 4),
        "input_resolution": torch.tensor(224),
    }
    src = tmp_path / "clip.pt"
    torch.save(sd, src)
    out = convert.convert_clip(str(src), str(tmp_path / "clip.npz"))
    assert "visual.conv1.weight" in out
    assert out["visual.conv1.weight"].dtype == np.float32  # fp16 upcast
    assert "visual.attn_mask" not in out
    assert "input_resolution" not in out


def test_unflatten_matches_clip_pytree_structure():
    from spi_tpu.models.perception.clip import tiny_test_clip
    from spi_tpu.utils.checkpoint import flatten_pytree, unflatten_to_nested

    import jax

    model = tiny_test_clip()
    params = model.init(jax.random.PRNGKey(0))
    flat = flatten_pytree(params)
    rebuilt = unflatten_to_nested({k: np.asarray(v) for k, v in flat.items()})
    # structure must round-trip: same leaves reachable, same shapes
    f2 = flatten_pytree(rebuilt)
    assert set(f2) == set(flat)
    for k in flat:
        assert f2[k].shape == flat[k].shape
