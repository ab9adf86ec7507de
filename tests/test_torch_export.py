"""Round-trip of the checkpoint bridge: reference torch state dict -> flax
params (`convert_*`) -> torch state dict (`export_*`) must reproduce every
tensor exactly, and the exported file must load back through torch.

Uses the READ-ONLY reference repo's own torch models as the key-name oracle,
like tests/test_torch_parity.py."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not available", allow_module_level=True)
sys.path.insert(0, REFERENCE)

from panopticdiffusionmodels_tpu.utils.torch_bridge import (  # noqa: E402
    convert_uvit,
    convert_uvit_t2i,
    export_uvit,
    export_uvit_t2i,
    load_torch_state_dict,
    save_torch_state_dict,
)


def _to_numpy_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _assert_sd_equal(exported, original, ignore=()):
    missing = set(original) - set(exported) - set(ignore)
    extra = set(exported) - set(original)
    assert not missing, f"export missing keys: {sorted(missing)[:8]}"
    assert not extra, f"export has extra keys: {sorted(extra)[:8]}"
    for k in exported:
        np.testing.assert_array_equal(
            exported[k], original[k], err_msg=f"mismatch at {k}"
        )


@pytest.mark.parametrize("scan_blocks", [False, True])
@pytest.mark.parametrize("num_classes", [-1, 10])
def test_uvit_roundtrip_exact(num_classes, scan_blocks):
    import libs.uvit as ref_uvit

    torch.manual_seed(0)
    net = ref_uvit.UViT(img_size=8, patch_size=2, in_chans=3, embed_dim=32,
                        depth=4, num_heads=4, mlp_ratio=2, qkv_bias=False,
                        mlp_time_embed=True, num_classes=num_classes)
    sd = _to_numpy_sd(net)
    params = convert_uvit(sd, depth=4, mlp_time_embed=True,
                          num_classes=num_classes, scan_blocks=scan_blocks)
    back = export_uvit(params, patch_size=2)
    _assert_sd_equal(back, sd)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_uvit_t2i_panoptic_roundtrip_exact(scan_blocks):
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(1)
    net = ref_t2i.UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                       depth=4, num_heads=4, mlp_ratio=2, qkv_bias=False,
                       mlp_time_embed=False, clip_dim=16, num_clip_token=7,
                       num_panoptic_class=8, enable_panoptic=True,
                       use_ground_truth=False, separate=True)
    sd = _to_numpy_sd(net)
    params = convert_uvit_t2i(sd, depth=4, scan_blocks=scan_blocks)
    back = export_uvit_t2i(params, patch_size=2)
    # The reference allocates 2*depth+2 zero convs but only wires the odd
    # indices (libs/uvit_t2i.py:435,452,470); the even-index ones never see a
    # gradient, so round-trip covers exactly the functional set.
    unused = {k for k in sd if k.startswith("zero_convs.")
              and int(k.split(".")[1]) % 2 == 0}
    # cross-attention modules defined but unused in the forward path
    unused |= {k for k in sd if ".cross_attn" in k or k.startswith("cross_attn")}
    # mask_embed_0 is allocated but its only use sits inside a commented-out
    # block (reference libs/uvit_t2i.py:392-396)
    unused |= {k for k in sd if k.startswith("mask_embed_0.")}
    _assert_sd_equal(back, sd, ignore=unused)


def test_export_file_loads_in_torch(tmp_path):
    """A freshly-initialized flax model exports to a .pth that torch loads and
    convert_uvit consumes again, closing the loop without reference weights."""
    import jax
    import jax.numpy as jnp

    from panopticdiffusionmodels_tpu.models import UViT

    model = UViT(img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=4,
                 num_heads=4, mlp_ratio=2, num_classes=-1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    sd = export_uvit(jax.tree.map(np.asarray, params), patch_size=2)
    path = str(tmp_path / "exported.pth")
    save_torch_state_dict(sd, path)
    loaded = load_torch_state_dict(path)
    params2 = convert_uvit(loaded, depth=4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2,
    )
