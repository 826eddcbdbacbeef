"""DensePose CSE: continuous surface embeddings.

Counterpart of the CSE half of ``projects/DensePose`` in the reference:

- vertex embedders (``densepose/modeling/cse/vertex_direct_embedder.py``,
  ``vertex_feature_embedder.py``, container ``embedder.py``): per-mesh
  [N_vertices, D] embeddings, L2-normalized on the sphere;
- the embedding predictor (``modeling/predictors/cse.py``): deconv 2x +
  bilinear 2x heads producing a D-channel pixel-embedding map and a coarse
  segmentation map per ROI;
- the embedding loss (``modeling/losses/embed.py``): cross-entropy over
  per-vertex scores ``-||e_pix - e_vertex||^2 / sigma`` at annotated points,
  grouped by mesh;
- the pixel-to-shape cycle loss (``modeling/losses/cycle_pix2shape.py``):
  softmax pixel->vertex->pixel round trip penalized by pixel distances;
- nearest-vertex inference (``converters`` + ``structures/cse.py``).

TPU formulation: annotated points live in fixed-capacity masked arrays
(like the chart pipeline, ``projects/densepose.py``); meshes form a STATIC
list so the per-mesh grouping is an unrolled masked loop; scores are plain
matmuls on the MXU. The fg-pixel sampling of the cycle loss uses masked
Gumbel top-k (a fixed sample budget) instead of the reference's
``randperm`` — same distribution over subsets, static shapes.

Out of scope (documented in README non-goals): SoftEmbeddingLoss and the
shape-to-shape cycle loss — both require per-mesh geodesic-distance
matrices (``mesh.geodists``) shipped as external SMPL data files, like the
GPS/GPSm evaluator.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.projects.densepose import chart_point_sample


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """One mesh's embedder spec (ref cse/embedder.py EMBEDDERS entries)."""
    name: str
    num_vertices: int
    embedder_type: str = "vertex_direct"   # or "vertex_feature"
    feature_dim: int = 0                   # for vertex_feature
    features_trainable: bool = False


@dataclasses.dataclass(frozen=True)
class CSEConfig:
    """ROI_DENSEPOSE_HEAD.CSE defaults (ref densepose/config.py:110-155)."""
    embed_size: int = 16
    embedding_dist_gauss_sigma: float = 0.01
    embed_loss_weight: float = 0.6
    segm_weight: float = 2.0               # INDEX_WEIGHTS (MaskOrSegmentation)
    num_coarse_segm_channels: int = 2
    deconv_kernel: int = 4
    up_scale: int = 2
    meshes: Tuple[MeshSpec, ...] = (MeshSpec("smpl_27554", 27554),)
    # PIX_TO_SHAPE_CYCLE_LOSS (ref :142-155)
    pix2shape_enabled: bool = False
    pix2shape_weight: float = 1e-4
    pix2shape_num_pixels: int = 100
    pix2shape_temp_pix2vertex: float = 0.05
    pix2shape_temp_vertex2pix: float = 0.05
    pix2shape_norm_p: int = 2


# ---------------------------------------------------------------------------
# Embedders (ref cse/vertex_*_embedder.py, embedder.py)
# ---------------------------------------------------------------------------

def normalize_embeddings(e: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """L2-normalize along the last axis (ref cse/utils.py:10-21)."""
    norm = jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e / jnp.maximum(norm, eps)


def squared_euclidean_distance_matrix(a: jnp.ndarray, b: jnp.ndarray
                                      ) -> jnp.ndarray:
    """(M, D) x (K, D) -> (M, K) squared distances (ref cse/utils.py:24-38);
    the matmul form keeps this on the MXU."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # (M, 1)
    b2 = jnp.sum(b * b, axis=-1)[None, :]                # (1, K)
    ab = a @ b.T                                          # (M, K)
    return a2 + b2 - 2.0 * ab


class VertexDirectEmbedder(nn.Module):
    """Free [N, D] embedding table (ref vertex_direct_embedder.py; the
    reference zero-initializes and loads pretrained values)."""
    num_vertices: int
    embed_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        e = self.param(
            "embeddings", nn.initializers.normal(0.01),
            (self.num_vertices, self.embed_dim),
        )
        return normalize_embeddings(e)


class VertexFeatureEmbedder(nn.Module):
    """[N, K] fixed/trainable features x [K, D] projection
    (ref vertex_feature_embedder.py: E = normalize(F @ W))."""
    num_vertices: int
    feature_dim: int
    embed_dim: int
    train_features: bool = False

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        if self.train_features:
            feats = self.param(
                "features", nn.initializers.normal(0.01),
                (self.num_vertices, self.feature_dim),
            )
        else:
            feats = self.variable(
                "constants", "features",
                lambda: jnp.zeros((self.num_vertices, self.feature_dim)),
            ).value
        w = self.param(
            "embed_matrix", nn.initializers.normal(0.01),
            (self.feature_dim, self.embed_dim),
        )
        return normalize_embeddings(feats @ w)


class Embedder(nn.Module):
    """Mesh-name -> vertex embeddings container (ref cse/embedder.py:67).
    Call with a mesh name; the set of meshes is static config."""
    cfg: CSEConfig

    def setup(self):
        mods = {}
        for spec in self.cfg.meshes:
            if spec.embedder_type == "vertex_direct":
                mods[spec.name] = VertexDirectEmbedder(
                    spec.num_vertices, self.cfg.embed_size,
                    name=f"embedder_{spec.name}",
                )
            elif spec.embedder_type == "vertex_feature":
                mods[spec.name] = VertexFeatureEmbedder(
                    spec.num_vertices, spec.feature_dim, self.cfg.embed_size,
                    spec.features_trainable, name=f"embedder_{spec.name}",
                )
            else:
                raise ValueError(spec.embedder_type)
        self._embedders = mods

    def mesh_names(self):
        return [s.name for s in self.cfg.meshes]

    def __call__(self, mesh_name: Optional[str] = None):
        """One mesh's embeddings, or — with no argument — a dict of every
        mesh's (the form used at init and in the train step, so all
        embedder parameters are created)."""
        if mesh_name is None:
            return {s.name: self._embedders[s.name]()
                    for s in self.cfg.meshes}
        return self._embedders[mesh_name]()


# ---------------------------------------------------------------------------
# Predictor (ref predictors/cse.py)
# ---------------------------------------------------------------------------

class DensePoseEmbeddingPredictor(nn.Module):
    """Deconv-2x heads for coarse segmentation + pixel embeddings, each
    bilinearly upscaled UP_SCALE more (ref predictors/cse.py:34-72).
    Same deconv geometry as the chart predictor
    (projects/densepose.DensePoseChartPredictor._deconv)."""
    cfg: CSEConfig
    dtype: jnp.dtype = jnp.float32

    def _deconv(self, x, out_ch, name):
        k = self.cfg.deconv_kernel
        y = nn.ConvTranspose(
            out_ch, (k, k), strides=(2, 2), padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype, name=name,
        )(x)
        s = self.cfg.up_scale
        if s > 1:
            b, h, w, c = y.shape
            y = jax.image.resize(y, (b, h * s, w * s, c), "bilinear")
        return y.astype(jnp.float32)

    @nn.compact
    def __call__(self, head_outputs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """head_outputs: (N, S, S, C) NHWC ->
        {embedding (N, 4S, 4S, D), coarse_segm (N, 4S, 4S, C_segm)}."""
        return {
            "embedding": self._deconv(
                head_outputs, self.cfg.embed_size, "embed_lowres"),
            "coarse_segm": self._deconv(
                head_outputs, self.cfg.num_coarse_segm_channels,
                "coarse_segm_lowres"),
        }


# ---------------------------------------------------------------------------
# Annotated points (fixed capacity)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CsePoints:
    """Per-ROI annotated vertices; (N, P) arrays, masked by ``valid``.
    x/y are proposal-box-normalized in [0, 1] (after
    ``projects/densepose.remap_points_to_proposals``)."""
    x: jnp.ndarray
    y: jnp.ndarray
    vertex_ids: jnp.ndarray     # (N, P) int32
    mesh_ids: jnp.ndarray       # (N, P) int32 — index into CSEConfig.meshes
    valid: jnp.ndarray          # (N, P) bool


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def embedding_loss(
    embedding_maps: jnp.ndarray,     # (N, S, S, D)
    points: CsePoints,
    mesh_embeddings: Sequence[jnp.ndarray],   # static list of (K_m, D)
    roi_valid: jnp.ndarray,          # (N,) bool
    gauss_sigma: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    """Cross-entropy over vertex scores at annotated points, per mesh
    (ref losses/embed.py:34-112): scores = -||e_pix - e_vert||^2 / sigma,
    e_pix bilinearly sampled at the point and L2-normalized."""
    n, p = points.valid.shape
    d = embedding_maps.shape[-1]
    coords = jnp.stack([points.x, points.y], -1)          # (N, P, 2)
    sampled = chart_point_sample(embedding_maps, coords)  # (N, P, D)
    sampled = normalize_embeddings(sampled).reshape(n * p, d)
    vids = points.vertex_ids.reshape(n * p)
    mids = points.mesh_ids.reshape(n * p)
    ok = (points.valid & roi_valid[:, None]).reshape(n * p)

    losses = {}
    for m, mesh_e in enumerate(mesh_embeddings):
        sel = ok & (mids == m)
        scores = -squared_euclidean_distance_matrix(
            sampled, mesh_e) / gauss_sigma                # (NP, K_m)
        logp = jax.nn.log_softmax(scores, axis=-1)
        vid = jnp.clip(vids, 0, mesh_e.shape[0] - 1)
        ce = -jnp.take_along_axis(logp, vid[:, None], axis=-1)[:, 0]
        losses[m] = jnp.sum(jnp.where(sel, ce, 0.0)) / jnp.maximum(
            jnp.sum(sel), 1)
    return losses


def _pixel_dist_matrix(s: int) -> jnp.ndarray:
    """(S^2, S^2) squared pixel-coordinate distances
    (ref cycle_pix2shape.py:18-27)."""
    rr, cc = jnp.meshgrid(jnp.arange(s), jnp.arange(s), indexing="ij")
    coords = jnp.stack([rr, cc], -1).reshape(s * s, 2).astype(jnp.float32)
    return squared_euclidean_distance_matrix(coords, coords)


def pix_to_shape_cycle_loss(
    embedding_maps: jnp.ndarray,     # (N, S, S, D)
    fg_masks: jnp.ndarray,           # (N, S, S) bool — GT foreground
    roi_valid: jnp.ndarray,          # (N,) bool
    mesh_embeddings: Sequence[jnp.ndarray],
    rng: jax.Array,
    num_pixels: int = 100,
    temp_p2v: float = 0.05,
    temp_v2p: float = 0.05,
    norm_p: int = 2,
) -> jnp.ndarray:
    """Pixel->vertex->pixel softmax cycle penalized by pixel distances
    (ref cycle_pix2shape.py:48-147). Fixed sample budget via masked Gumbel
    top-k in place of the reference's randperm over fg pixels."""
    n, s, _, d = embedding_maps.shape
    flat_e = embedding_maps.reshape(n, s * s, d)
    flat_fg = fg_masks.reshape(n, s * s)
    dists = _pixel_dist_matrix(s)                          # (S^2, S^2)

    gumbel = jax.random.gumbel(rng, flat_fg.shape)
    score = jnp.where(flat_fg, gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(score, num_pixels)              # (N, M)
    picked_ok = jnp.take_along_axis(flat_fg, idx, axis=1)  # (N, M)

    def per_roi(e_flat, pick, pick_ok, valid):
        pe = normalize_embeddings(e_flat[pick])            # (M, D)
        ok = pick_ok & valid
        pd = dists[pick][:, pick]                          # (M, M)
        total = jnp.zeros(())
        for mesh_e in mesh_embeddings:
            sim = pe @ mesh_e.T                            # (M, K)
            c_pv = jax.nn.softmax(
                jnp.where(ok[:, None], sim / temp_p2v, -1e9), axis=1)
            v2p = jnp.where(ok[None, :], sim.T / temp_v2p, -1e9)
            c_vp = jax.nn.softmax(v2p, axis=1)
            c_cycle = c_pv @ c_vp                          # (M, M)
            c_cycle = c_cycle * (ok[:, None] & ok[None, :])
            total += jnp.power(
                jnp.sum(jnp.abs(pd * c_cycle) ** norm_p) + 1e-12,
                1.0 / norm_p)
        return jnp.where(valid & jnp.any(ok), total / len(mesh_embeddings),
                         0.0)

    per = jax.vmap(per_roi)(flat_e, idx, picked_ok, roi_valid)
    denom = jnp.maximum(jnp.sum(roi_valid), 1)
    return jnp.sum(per) / denom


def densepose_cse_losses(
    predictor_out: Dict[str, jnp.ndarray],
    points: CsePoints,
    coarse_segm_gt: jnp.ndarray,     # (N, S, S) int32 (0 bg / 1 fg)
    roi_valid: jnp.ndarray,
    mesh_embeddings: Sequence[jnp.ndarray],
    cfg: CSEConfig,
    mesh_names: Optional[Sequence[str]] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Full CSE loss dict (ref losses/cse.py DensePoseCseLoss.__call__):
    loss_densepose_S (coarse segm CE) + per-mesh loss_densepose_E{mesh}
    (+ loss_pix2shape when enabled)."""
    names = list(mesh_names or [s.name for s in cfg.meshes])
    # coarse segmentation CE (MaskOrSegmentationLoss in mask mode)
    segm = predictor_out["coarse_segm"]                   # (N, S, S, C)
    logp = jax.nn.log_softmax(segm, axis=-1)
    gt = jnp.clip(coarse_segm_gt, 0, segm.shape[-1] - 1)
    ce = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
    w = roi_valid[:, None, None]
    loss_s = jnp.sum(jnp.where(w, ce, 0.0)) / jnp.maximum(
        jnp.sum(w * jnp.ones_like(ce)), 1.0)

    emb_losses = embedding_loss(
        predictor_out["embedding"], points, mesh_embeddings, roi_valid,
        gauss_sigma=cfg.embedding_dist_gauss_sigma,
    )
    out = {"loss_densepose_S": cfg.segm_weight * loss_s}
    for m, name in enumerate(names):
        out[f"loss_densepose_E{name}"] = (
            cfg.embed_loss_weight * emb_losses[m]
        )
    if cfg.pix2shape_enabled:
        assert rng is not None
        fg = coarse_segm_gt > 0
        # the cycle loss runs at the embedding resolution
        s_out = predictor_out["embedding"].shape[1]
        if fg.shape[1] != s_out:
            fg = jax.image.resize(
                fg.astype(jnp.float32),
                (fg.shape[0], s_out, s_out), "nearest") > 0.5
        out["loss_pix2shape"] = cfg.pix2shape_weight * pix_to_shape_cycle_loss(
            predictor_out["embedding"], fg, roi_valid, mesh_embeddings, rng,
            num_pixels=cfg.pix2shape_num_pixels,
            temp_p2v=cfg.pix2shape_temp_pix2vertex,
            temp_v2p=cfg.pix2shape_temp_vertex2pix,
            norm_p=cfg.pix2shape_norm_p,
        )
    return out


# ---------------------------------------------------------------------------
# ROI-heads integration (ref densepose/modeling/roi_heads/roi_head.py
# _forward_densepose with a CSE predictor)
# ---------------------------------------------------------------------------

class DensePoseCseHeads(nn.Module):
    """Pool + v1-convX head + embedding predictor over FPN features — the
    CSE counterpart of ``projects/densepose.DensePoseHeads`` (same pooling
    geometry: resolution 28 on p2-p5).

    Train: pass fg ROI boxes, per-ROI ``CsePoints`` (proposal-frame
    coords), per-ROI coarse-segm GT and the precomputed mesh embeddings.
    Inference: returns {embedding, coarse_segm} maps per ROI.
    """

    cfg: CSEConfig
    head_convs: int = 8
    head_dim: int = 512
    pooler_resolution: int = 28
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    dtype: jnp.dtype = jnp.float32

    def _pool(self, features, boxes):
        from u2seg_tpu.ops.roi_align import multilevel_roi_align

        b, r, _ = boxes.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        feats = [features[f"p{i + 2}"] for i in range(len(self.strides))]
        return multilevel_roi_align(
            feats, boxes.reshape(-1, 4), batch_idx, self.pooler_resolution,
            self.strides,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],    # FPN maps, NHWC
        boxes: jnp.ndarray,                  # (B, R, 4) xyxy image coords
        train: bool = False,
        points: Optional[CsePoints] = None,          # (B*R, P) flattened
        coarse_segm_gt: Optional[jnp.ndarray] = None,  # (B*R, S, S)
        roi_live: Optional[jnp.ndarray] = None,      # (B, R)
        mesh_embeddings: Optional[Sequence[jnp.ndarray]] = None,
        rng: Optional[jax.Array] = None,
    ):
        from u2seg_tpu.projects.densepose import (
            DensePoseConfig, DensePoseV1ConvXHead,
        )

        head_cfg = DensePoseConfig(
            num_stacked_convs=self.head_convs, conv_head_dim=self.head_dim,
        )
        pooled = self._pool(features, boxes).astype(self.dtype)
        x = DensePoseV1ConvXHead(head_cfg, self.dtype, name="head")(pooled)
        outputs = DensePoseEmbeddingPredictor(
            self.cfg, self.dtype, name="predictor")(x)
        if not train:
            b, r, _ = boxes.shape
            return {k: v.reshape(b, r, *v.shape[1:])
                    for k, v in outputs.items()}
        assert points is not None and coarse_segm_gt is not None
        assert roi_live is not None and mesh_embeddings is not None
        return densepose_cse_losses(
            outputs, points, coarse_segm_gt, roi_live.reshape(-1),
            mesh_embeddings, self.cfg, rng=rng,
        )


# ---------------------------------------------------------------------------
# Inference (ref converters/chart_output_* analog for CSE +
# structures/cse.py DensePoseEmbeddingPredictorOutput)
# ---------------------------------------------------------------------------

def cse_nearest_vertices(
    embedding_map: jnp.ndarray,      # (S, S, D)
    coarse_segm: jnp.ndarray,        # (S, S, C)
    mesh_embeddings: jnp.ndarray,    # (K, D)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel nearest mesh vertex + fg mask
    (ref densepose/converters/builtin.py + squared distance argmin)."""
    s = embedding_map.shape[0]
    e = normalize_embeddings(embedding_map.reshape(s * s, -1))
    d2 = squared_euclidean_distance_matrix(e, mesh_embeddings)
    vertex_ids = jnp.argmin(d2, axis=-1).astype(jnp.int32).reshape(s, s)
    fg = jnp.argmax(coarse_segm, axis=-1) > 0
    return vertex_ids, fg
