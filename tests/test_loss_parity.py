"""Loss formula parity vs. a torch re-implementation of main.py:366-402.

torch (CPU) is available in the image; we recompute the reference formula
with torch ops and require agreement to float tolerance.
"""

import numpy as np
import jax.numpy as jnp

from gcn_recommendation_tpu.train.loss import bpr_loss_reg


def _torch_reference(fu, fp, fn_, iu, ip, in_, lam, brand=None, pb=None, nb=None, w=0.1):
    import torch

    fu, fp, fn_, iu, ip, in_ = (torch.tensor(x) for x in (fu, fp, fn_, iu, ip, in_))
    pos = torch.sum(fu * fp, dim=1)
    neg = torch.sum(fu * fn_, dim=1)
    bpr = -torch.mean(torch.log(torch.sigmoid(pos - neg) + 1e-8))
    bl = 0.0
    if brand is not None:
        brand = torch.tensor(brand)
        pbe, nbe = brand[torch.tensor(pb)], brand[torch.tensor(nb)]
        bp = torch.sum(fu * pbe, dim=1)
        bn = torch.sum(fu * nbe, dim=1)
        bl = -torch.mean(torch.log(torch.sigmoid(bp - bn) + 1e-8))
    reg = lam * (iu.norm(2).pow(2) + ip.norm(2).pow(2) + in_.norm(2).pow(2)) / float(
        len(fu)
    )
    return float(bpr + w * bl + reg)


def test_bpr_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    B, d = 64, 16
    args = [rng.standard_normal((B, d)).astype(np.float32) for _ in range(6)]
    lam = 1e-4
    ours = float(bpr_loss_reg(*(jnp.asarray(a) for a in args), lam))
    ref = _torch_reference(*args, lam)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bpr_loss_with_brand_term_matches():
    rng = np.random.default_rng(1)
    B, d, nb = 32, 8, 10
    args = [rng.standard_normal((B, d)).astype(np.float32) for _ in range(6)]
    brand = rng.standard_normal((nb, d)).astype(np.float32)
    pb = rng.integers(0, nb, B)
    nbi = rng.integers(0, nb, B)
    lam = 1e-4
    ours = float(
        bpr_loss_reg(
            *(jnp.asarray(a) for a in args),
            lam,
            brand_loss=True,
            final_brand_emb=jnp.asarray(brand),
            pos_item_brand_idx=jnp.asarray(pb),
            neg_item_brand_idx=jnp.asarray(nbi),
            brand_loss_weight=0.1,
        )
    )
    ref = _torch_reference(*args, lam, brand=brand, pb=pb, nb=nbi, w=0.1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_brand_loss_masks_missing_brand_sentinel():
    """Items without brand metadata carry -1 (data/loader.py); those
    pairs must not contribute to the brand term."""
    rng = np.random.default_rng(2)
    B, d, nb = 16, 8, 5
    args = [rng.standard_normal((B, d)).astype(np.float32) for _ in range(6)]
    brand = rng.standard_normal((nb, d)).astype(np.float32)
    pb = rng.integers(0, nb, B).astype(np.int32)
    nbr = rng.integers(0, nb, B).astype(np.int32)
    lam = 1e-4

    full = float(bpr_loss_reg(
        *(jnp.asarray(a) for a in args), lam,
        brand_loss=True, final_brand_emb=jnp.asarray(brand),
        pos_item_brand_idx=jnp.asarray(pb), neg_item_brand_idx=jnp.asarray(nbr),
    ))

    # sentinel out half the pairs: result must equal the loss computed on
    # the valid half alone (brand term re-averaged over valid pairs only)
    pb2, nb2 = pb.copy(), nbr.copy()
    pb2[: B // 2] = -1
    masked = float(bpr_loss_reg(
        *(jnp.asarray(a) for a in args), lam,
        brand_loss=True, final_brand_emb=jnp.asarray(brand),
        pos_item_brand_idx=jnp.asarray(pb2), neg_item_brand_idx=jnp.asarray(nb2),
    ))

    # reference value: brand term over the valid half, BPR/reg over all
    base = float(bpr_loss_reg(*(jnp.asarray(a) for a in args), lam))
    import torch

    fu = torch.tensor(args[0][B // 2 :])
    pbe = torch.tensor(brand)[torch.tensor(pb[B // 2 :].astype(np.int64))]
    nbe = torch.tensor(brand)[torch.tensor(nbr[B // 2 :].astype(np.int64))]
    bl = -torch.mean(torch.log(torch.sigmoid(
        torch.sum(fu * pbe, dim=1) - torch.sum(fu * nbe, dim=1)) + 1e-8))
    np.testing.assert_allclose(masked, base + 0.1 * float(bl), rtol=1e-5)
    assert masked != full
