"""Model hyper-parameter configuration.

Mirrors the reference's hard-coded config (`/root/reference/src/config.h:53-87`
and `/root/reference/src/pocket_tts/models/defaults.h:3-122`), expressed as
dataclasses so tests can instantiate tiny variants.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Flow-matching MLP (SimpleMLPAdaLN). ref: src/config.h:3-6."""
    depth: int = 6
    dim: int = 512
    # frequency-embedding half-size of the TimestepEmbedder; the reference
    # infers this from the checkpoint's `freqs` tensor (src/pocket_tts/modules/mlp.h:86).
    freq_half: int = 128
    # hidden width of each ResBlock MLP; inferred from checkpoint in practice.
    mlp_hidden: int = 512


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """FlowLM streaming transformer. ref: src/config.h:8-14."""
    d_model: int = 1024
    hidden_scale: int = 4
    max_period: int = 10000
    num_heads: int = 16
    num_layers: int = 6
    # KV capacity; the reference allocates seq-len 1000 states
    # (src/pocket_tts.cpp:367-368) — rounded up to 1024 here so cache reads
    # tile cleanly into 128-slot blocks (strictly more headroom).
    kv_capacity: int = 1024
    # Pallas flash-decode attention for T=1 steps: reads only the live
    # cache prefix AND (as a Mosaic custom call) forces the batched cache
    # carry into the default B-major layout, which XLA's own layout
    # assignment trades away for the one-slot insert (measured +17%
    # aggregate at batch 32). None = auto (on for TPU backends, XLA
    # seg-matmul elsewhere); True forces it (interpret mode off-TPU —
    # slow, tests only); False forces the XLA path.
    use_pallas_attn: bool = None
    # Opt-in int8 KV cache (per-row absmax scales): halves the decode
    # attention's cache reads — the dominant batched cost once weights are
    # quantized. Off by default (reference numerics keep the cache in the
    # compute dtype); enable for serving throughput.
    quantize_kv: bool = False
    # Fold the per-token KV-row insert into the Pallas decode-attention
    # kernel (analytic merge + aligned-window DMA write-back) instead of
    # 2-4 dynamic_update_slice dispatches per layer — only takes effect
    # when the Pallas decode kernel runs. Measured on v5e
    # (tools/measure_kernels.py, device-trace, bit-identical audio):
    # +5.8% aggregate at batch-32 serving (43.1k vs 40.7k f/s), a wash at
    # B=1 (the DUS is ~free solo). None = auto: ON for batched serving
    # (resolved by runtime.batched.mesh_cfg, which every batched consumer
    # builds its cfg through), OFF for solo decode (None is falsy at the
    # kernel-dispatch site). True/False force it either way.
    fuse_insert: bool = None
    # Whole-layer megakernel for SOLO quantized decode (ops/fused_step.py):
    # norm1+in_proj -> in-kernel rope + KV quantize -> fused insert+flash
    # -> out_proj+MLP in ONE Pallas call per layer. Batched paths keep the
    # 3-call kernels (the megakernel would re-stream weights per stream
    # group). Off until validated/measured on hardware.
    use_megalayer: bool = False
    # Bilayer kernel for SOLO int4 decode (ops/fused_layer.bilayer_post_pre):
    # post-attention(l) + pre-attention(l+1) fuse into ONE Pallas call —
    # one kernel boundary fewer per layer, with the flash-decode kernel
    # (whose in-megalayer fusion measured SLOWER) left standalone.
    use_bilayer: bool = False
    # additive bias for masked attention slots: -1e9 (ours, negligible after
    # softmax) vs the reference's -1e5 "can't use infinity" hack
    # (torch.h:124-143). A/B switch for real-weights bit comparison.
    mask_value: float = -1e9
    # jax.sharding.Mesh (hashable, so it can live in this static cfg) for
    # mesh-sharded decode: the Pallas flash-decode kernel runs inside
    # jax.shard_map over ("data" streams, "model" head-slices) instead of
    # being pinned off. Set ONLY through runtime.batched.mesh_cfg.
    mesh: object = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def hidden_dim(self) -> int:
        return self.d_model * self.hidden_scale


@dataclasses.dataclass(frozen=True)
class LookupTableConfig:
    """Text conditioner. ref: src/config.h:16-21."""
    dim: int = 1024
    n_bins: int = 4000
    tokenizer: str = "sentencepiece"
    tokenizer_path: str = "tokenizer.model"


@dataclasses.dataclass(frozen=True)
class MimiTransformerConfig:
    """Mimi decoder transformer. ref: src/pocket_tts/models/defaults.h:3-42."""
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 2
    hidden_dim: int = 2048
    context: int = 250
    # ring capacity: the reference uses 250 (= context); rounded up to a
    # multiple of the 16-step frame so the ring insert is a contiguous,
    # in-place dynamic_update_slice (a scatter copies the whole cache every
    # frame). The attention window is still `context`; the only semantic
    # delta is that queries early in a block can see up to 6 slots the
    # reference's ring had already overwritten — i.e. closer to the true
    # 250-step sliding window.
    capacity: int = 256
    # Opt-in int8 ring KV (per-row absmax scales, like the backbone's
    # cfg.backbone.quantize_kv). Halves the ring's cache bytes, but
    # MEASURED SLOWER on v5e (-1.7% at B=32 serving, -1.9% B=1,
    # tools/measure_mimi_kv.py): this cache is small and VMEM-resident
    # per grid step, so the int8->bf16 cast + window-compose VPU work
    # outweighs the halved reads (the opposite trade from the backbone's
    # big bandwidth-bound cache). Kept as a memory knob; engine
    # --quantize-kv deliberately does NOT enable it.
    quantize_kv: bool = False
    # fused Pallas ring-insert+attention kernel (ops/pallas_mimi.py):
    # None = auto (TPU backends only); requires capacity % 16 == 0 and the
    # default -1e9 mask — reference-exact mode falls back to XLA
    use_pallas_attn: bool = None
    max_period: int = 10000
    # eps=0 LayerNorm (defaults.h:14,32)
    norm_eps: float = 0.0
    # masked-slot bias; -1e5 in reference-exact mode (torch.h:141)
    mask_value: float = -1e9
    # mesh for shard_map-wrapped ring kernel (see BackboneConfig.mesh);
    # set ONLY through runtime.batched.mesh_cfg
    mesh: object = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclasses.dataclass(frozen=True)
class SeanetStage:
    """One (conv-transpose, resnet) upsampling stage of the SEANet decoder."""
    in_ch: int
    out_ch: int
    kernel: int
    stride: int


@dataclasses.dataclass(frozen=True)
class SeanetConfig:
    """SEANet decoder. ref: src/pocket_tts/models/defaults.h:44-122."""
    in_ch: int = 512
    first_kernel: int = 7           # model.0: conv k7 s1
    stages: tuple = (
        SeanetStage(512, 256, 12, 6),   # model.2
        SeanetStage(256, 128, 10, 5),   # model.5
        SeanetStage(128, 64, 8, 4),     # model.8
    )
    resnet_kernel: int = 3          # block.1 conv k3 s1 (channels halved)
    last_kernel: int = 3            # model.11: conv k3 s1 -> 1 channel
    out_ch: int = 1
    # whole-decoder Pallas megakernel (ops/pallas_seanet.py): None = auto
    # (TPU backends), True forces (interpret off-TPU), False = XLA chain
    use_pallas: bool = None
    # mesh for the shard_map-wrapped megakernel (streams over "data");
    # set ONLY through runtime.batched.mesh_cfg
    mesh: object = None

    @property
    def total_stride(self) -> int:
        s = 1
        for st in self.stages:
            s *= st.stride
        return s


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    """Mimi decode chain. ref: src/config.h:30-46, models/mimi.h:10-28."""
    sample_rate: int = 24000
    channels: int = 1
    frame_rate: float = 12.5
    latent_dim: int = 32            # quantizer.dimension
    dim: int = 512                  # quantizer.output_dimension
    upsample_kernel: int = 32       # depthwise convtr k32 s16 groups=512
    upsample_stride: int = 16
    transformer: MimiTransformerConfig = MimiTransformerConfig()
    seanet: SeanetConfig = SeanetConfig()

    @property
    def frame_size(self) -> int:
        # 16 * (6*5*4) = 1920 samples / 80ms frame
        return self.upsample_stride * self.seanet.total_stride


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full pocket-tts model configuration (reference defaults)."""
    flow: FlowConfig = FlowConfig()
    backbone: BackboneConfig = BackboneConfig()
    lut: LookupTableConfig = LookupTableConfig()
    mimi: MimiConfig = MimiConfig()
    latent_dim: int = 32
    eos_threshold: float = -4.0     # ref: models/flow_lm.h:94
    # GELU flavour: "erf" matches the original Python model (torch F.gelu
    # default); the ggml reference uses the tanh approximation
    # (torch.h / ggml_gelu). Configurable for A/B numerics.
    gelu_approx: bool = False
    # True whenever the decode program runs under a GSPMD mesh — set ONLY
    # through runtime.batched.mesh_cfg. Distinct from the sub-configs'
    # `mesh` fields (those carry the mesh to shard_map-wrapped kernels and
    # stay None when a kernel falls back to its XLA path): kernels with no
    # shard_map wrapper (the fused flow net) must gate on THIS, or a
    # fallback cfg would let an un-partitionable Mosaic call into a
    # sharded program.
    on_mesh: bool = False


def reference_exact_config(base: "ModelConfig" = None) -> "ModelConfig":
    """ggml-reference-exact numerics: the A/B switchboard for real-weights
    bit comparison against the C++ build. Flips every documented divergence:

    - tanh GELU (ggml_gelu) instead of erf (torch.h analog)
    - mask bias -1e5 instead of -1e9 (torch.h:141)
    - mimi ring capacity == context == 250 (defaults.h:5-7) — the insert
      becomes a row scatter (slow path) but slot eviction order matches the
      reference exactly.
    - XLA decode attention (use_pallas_attn=False): the Mosaic kernel
      hard-codes the -1e9 mask and accumulates bf16 kernel numerics, which
      would silently override the -1e5 setting on TPU.

    Engine-level dtype (f32 vs bf16) stays a TTSEngine(dtype=...) choice.
    """
    base = base or DEFAULT_CONFIG
    return dataclasses.replace(
        base,
        gelu_approx=True,
        backbone=dataclasses.replace(base.backbone, mask_value=-1e5,
                                     use_pallas_attn=False),
        mimi=dataclasses.replace(
            base.mimi,
            transformer=dataclasses.replace(
                base.mimi.transformer, mask_value=-1e5,
                use_pallas_attn=False,
                capacity=base.mimi.transformer.context)),
    )


def tiny_config(seed_dims: int = 16) -> ModelConfig:
    """A miniature config for fast CPU tests; same topology, tiny dims."""
    d = seed_dims  # 16
    return ModelConfig(
        flow=FlowConfig(depth=2, dim=2 * d, freq_half=8, mlp_hidden=2 * d),
        backbone=BackboneConfig(
            d_model=4 * d, hidden_scale=2, num_heads=4, num_layers=2,
            kv_capacity=128),
        lut=LookupTableConfig(dim=4 * d, n_bins=256),
        mimi=MimiConfig(
            latent_dim=8, dim=2 * d,
            transformer=MimiTransformerConfig(
                d_model=2 * d, num_heads=2, num_layers=2, hidden_dim=4 * d,
                context=40, capacity=48),
            seanet=SeanetConfig(
                in_ch=2 * d,
                stages=(
                    SeanetStage(2 * d, d, 12, 6),
                    SeanetStage(d, d // 2, 10, 5),
                    SeanetStage(d // 2, d // 4, 8, 4),
                ),
            ),
        ),
        latent_dim=8,
    )


DEFAULT_CONFIG = ModelConfig()
