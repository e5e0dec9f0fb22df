"""hartallo_tpu — a TPU-native H.264 AVC/SVC video codec engine.

A from-scratch re-expression of the capabilities of the reference C/SSE codec
``allweax/hartallo`` (see SURVEY.md) as a JAX/XLA/Pallas engine:

- pixel-domain coding tools (transforms, quant, intra/inter prediction,
  interpolation, deblocking, distortion metrics) are *batched integer tensor
  passes over the macroblock grid* (``hartallo_tpu.ops``), jitted for TPU;
- serial bitstream work (Exp-Golomb syntax, CAVLC entropy coding) lives on the
  host (``hartallo_tpu.bitio`` / ``hartallo_tpu.entropy``), with a native C
  fast path;
- the decoder/encoder pipelines (``hartallo_tpu.decode`` / ``.encode``)
  orchestrate host entropy <-> device pixel passes;
- multi-chip scaling shards MB rows within a frame and GOPs across hosts
  via ``jax.sharding`` meshes (``hartallo_tpu.parallel``).

Public API (hartallo-equivalent surface, reference hl_api.h):
    Engine, Codec/CodecConfig, Parser  — see ``hartallo_tpu.api``.
"""

__version__ = "0.1.0"

from hartallo_tpu.api import (  # noqa: F401
    Engine,
    CodecConfig,
    Codec,
    Parser,
    DecodeResult,
    EncodeResult,
)
