"""Dev server launcher: tiny random-init pipeline on a local port.

Lets you drive the full HTTP surface (POST /tts, /healthz, /metrics, web UI)
without checkpoints — weights are random, so output is noise-shaped audio,
but every code path (phonemize -> conditioning -> decode loop -> DAC ->
WAV) is the real one. Usage:

    JAX_PLATFORMS=cpu python tools/dev_server.py [port]
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # A sitecustomize hook pins the axon TPU plugin; env alone is not
    # enough (see tests/conftest.py) — override after import.
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

sys.path.insert(0, ".")

from zonos_vibes_tpu.config import (  # noqa: E402
    BackboneConfig, PrefixConditionerConfig, ZonosConfig, _freeze,
)
from zonos_vibes_tpu.models.dac import DACConfig  # noqa: E402
from zonos_vibes_tpu.models.autoencoder import DACAutoencoder  # noqa: E402
from zonos_vibes_tpu.models.speaker import SpeakerEncoder  # noqa: E402
from zonos_vibes_tpu.pipeline import ZonosPipeline  # noqa: E402
from zonos_vibes_tpu.serve.server import TTSServer  # noqa: E402

TINY_DAC = DACConfig(
    encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
    n_codebooks=9, codebook_size=1024, codebook_dim=4,
)
TINY_CFG = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=2, attn_mlp_d_intermediate=128,
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2}),
    ),
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {
            "projection": "linear",
            "conditioners": [
                {"type": "EspeakPhonemeConditioner", "name": "espeak"},
                {"type": "PassthroughConditioner", "name": "speaker",
                 "cond_dim": 16, "projection": "linear",
                 "uncond_type": "learned"},
                {"type": "FourierConditioner", "name": "emotion",
                 "input_dim": 8, "min_val": 0, "max_val": 1,
                 "uncond_type": "learned"},
                {"type": "FourierConditioner", "name": "speaking_rate",
                 "min_val": 0, "max_val": 40, "uncond_type": "learned"},
                {"type": "IntegerConditioner", "name": "language_id",
                 "min_val": -1, "max_val": 126, "uncond_type": "learned"},
            ],
        }
    ),
)


TINY_HYBRID_CFG = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=3, d_intermediate=0,
        attn_mlp_d_intermediate=96, attn_layer_idx=(1,),
        ssm_cfg=_freeze({"layer": "Mamba2", "d_state": 16, "headdim": 16,
                         "chunk_size": 8}),
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2,
                          "rotary_emb_dim": 8}),
        rms_norm=True, residual_in_fp32=True,
    ),
    prefix_conditioner=TINY_CFG.prefix_conditioner,
)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    port = int(args[0]) if args else 5050
    pipe = ZonosPipeline.from_config(
        TINY_CFG, key=jax.random.key(0), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    pipe.speaker_encoder = SpeakerEncoder(
        in_planes=4, embd_dim=24, lda_dim=16, depths=(1, 1, 1, 1)
    )
    pipe.speaker_params = pipe.speaker_encoder.init(jax.random.key(1))
    if "--int4-mlp" in sys.argv:
        pipe.quantize_int4(mixed=True)
    elif "--int8" in sys.argv:
        pipe.quantize_int8()
    extra = None
    if "--hybrid" in sys.argv:
        # Second model on the same queue ("model": "hybrid" in the payload)
        # — the pool machinery builds a per-model pool for it.
        extra = {"hybrid": ZonosPipeline.from_config(
            TINY_HYBRID_CFG, key=jax.random.key(2), dtype=jnp.float32,
            dac=DACAutoencoder(TINY_DAC),
        )}
    pooled = "--pooled" in sys.argv
    srv = TTSServer(pipe, host="127.0.0.1", port=port,
                    batch_window_s=1.0, request_timeout_s=600,
                    extra_pipelines=extra,
                    pooled=pooled, pool_slots=2,
                    pool_kv_int8="--pool-kv-int8" in sys.argv,
                    pool_state_bf16="--pool-state-bf16" in sys.argv)
    print(f"dev server on http://127.0.0.1:{port}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
