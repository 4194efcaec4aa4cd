# gramtools-tpu container: CPU-correct everywhere, TPU-fast on TPU VMs.
#
# Mirrors the reference's container story (/root/reference/ci/docker/)
# with a single image: the package's native helpers (SA-IS suffix sort,
# fastx parser, OpenMP baseline) compile on first use with g++, and the
# JAX backend is selected at runtime (install jax[tpu] on a TPU VM).
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/gramtools-tpu
COPY pyproject.toml README.md ./
COPY gramtools_tpu ./gramtools_tpu

# CPU jax by default; on a TPU VM rebuild with:
#   --build-arg JAX_SPEC="jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"
ARG JAX_SPEC="jax[cpu]"
RUN pip install --no-cache-dir ${JAX_SPEC} numpy && pip install --no-cache-dir .

# pre-build the native library so first run needs no compiler warm-up;
# portable ISA (no -march=native) so the image runs on older CPUs than
# the build host
ENV GRAMTOOLS_TPU_MARCH=portable
RUN python -c "from gramtools_tpu.index.native import get_native_lib; \
assert get_native_lib() is not None"

ENTRYPOINT ["gramtools-tpu"]
