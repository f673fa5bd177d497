# TPU-native deployment image for zonos-tpu.
#
# Reference parity: /root/reference/Dockerfile:1-11 builds on a CUDA
# PyTorch devel image and apt-installs espeak-ng; the TPU equivalent
# builds on a plain Python image and installs jax[tpu] (libtpu ships as a
# pip wheel — there is no CUDA toolkit analogue to bake in) plus the same
# espeak-ng host dependency for phonemization.
#
# Build:  docker build -t zonos-tpu .
# Run  :  see docker-compose.yml (TPU VMs expose the chips via
#         /dev/accel* and require privileged access).

FROM python:3.12-slim-bookworm

# Host-side phonemization (C library, SURVEY.md §2.9 N6) + audio IO +
# build toolchain for the native DSP library (native/zvt_dsp.cpp).
# espeak-ng is PINNED: phoneme output changes between espeak versions, and
# any drift vs the reference's voices breaks everything downstream
# (SURVEY.md §7 hard part #8). 1.51+dfsg is bookworm's espeak-ng line;
# bump deliberately and re-run the phoneme goldens below when changing it.
RUN apt-get update && apt-get install -y --no-install-recommends \
        'espeak-ng=1.51+dfsg*' libsndfile1 g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# TPU runtime: jax with the libtpu wheel. Pin jax to the version the
# framework is tested against when deploying to production.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml README.md ./
COPY zonos_vibes_tpu ./zonos_vibes_tpu
COPY native ./native

# Native host DSP (windowed-sinc resample + log-mel frontend).
RUN make -C native

RUN pip install --no-cache-dir ".[frontend]"

# Phoneme-tier gate (VERDICT r3 #6): the image must ship with the REAL
# espeak-ng library loadable through the ctypes tier and producing
# IPA-with-stress output over the conditioning symbol table — the
# real-lib golden test is skip-marked in espeak-less dev environments but
# MUST run (not skip) here, failing the build on phoneme drift.
COPY tests ./tests
COPY tools ./tools
RUN pip install --no-cache-dir pytest \
    && python -m pytest tests/test_phonemize_espeak.py -q \
    && python tools/capture_phoneme_fixture.py \
    && python -m pytest tests/test_phonemize_espeak.py -q -k cross_tier \
    && python - <<'PY'
# The real-lib golden above is skip-marked when libespeak-ng is absent —
# pytest exits 0 on skips, so enforce loadability EXPLICITLY: the ctypes
# tier (not just the phonemizer package) must find the shared library,
# guaranteeing the skip-marked golden actually ran.
from zonos_vibes_tpu.frontend.phonemize import _find_espeak_lib, backend_name
assert _find_espeak_lib() is not None, "libespeak-ng not ctypes-loadable"
assert backend_name() != "fallback", "espeak-ng not loadable in the image"
PY

EXPOSE 5000

# Same serving contract as the reference's server.py (POST /tts at :5000)
# plus warmup + persistent XLA compilation cache across restarts.
CMD ["zonos-tpu-serve", "--host", "0.0.0.0", "--port", "5000", \
     "--warmup", "--compilation-cache", "/cache/zvt-xla"]
