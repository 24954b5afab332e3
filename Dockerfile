# tpu_rvc container (reference role: /root/reference/Dockerfile:1 — a
# one-command server image; CUDA base swapped for a plain Python image
# because the compute backend here is JAX/XLA: CPU works out of the box,
# TPU attaches via the libtpu wheel on a TPU VM).
#
#   docker build -t tpu_rvc .
#   docker run -p 7865:7865 -v $PWD/assets:/app/assets tpu_rvc
#
# On a Cloud TPU VM, build with the TPU extra instead:
#   docker build --build-arg JAX_VARIANT="jax[tpu]" -t tpu_rvc .
#   docker run --privileged --net=host -v $PWD/assets:/app/assets tpu_rvc

FROM python:3.12-slim

EXPOSE 7865 7866

WORKDIR /app

ARG JAX_VARIANT="jax"

# ffmpeg: non-WAV containers (reference infer/lib/audio.py PyAV role);
# build tools: the native/ checksum + ring-buffer helpers
RUN apt-get update && \
    apt-get install -y --no-install-recommends ffmpeg gcc g++ make && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "${JAX_VARIANT}" flax optax numpy einops \
    scipy tensorboardX

COPY pyproject.toml sha256.env ./
COPY tpu_rvc ./tpu_rvc
COPY apps ./apps
COPY native ./native
COPY benchmarks ./benchmarks
COPY bench.py ./

RUN make -C native && pip install --no-cache-dir -e . --no-deps

# model assets are mounted (or fetched by the entrypoint's asset check:
# tpu_rvc.utils.assets mirrors the reference's rvcmd download role)
VOLUME /app/assets

ENTRYPOINT ["./apps/docker-entrypoint.sh"]
CMD ["web"]
