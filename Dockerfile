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
RUN apt-get update && apt-get install -y --no-install-recommends \
        espeak-ng libsndfile1 g++ make \
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

EXPOSE 5000

# Same serving contract as the reference's server.py (POST /tts at :5000)
# plus warmup + persistent XLA compilation cache across restarts.
CMD ["zonos-tpu-serve", "--host", "0.0.0.0", "--port", "5000", \
     "--warmup", "--compilation-cache", "/cache/zvt-xla"]
