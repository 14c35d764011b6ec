# TPU-host image for sl_hwgat_tpu (parity item: reference `Dockerfile:1-26`,
# which pins a CUDA/torch stack; this pins the JAX/libtpu TPU-VM stack).
#
# Build:  docker build -t sl-hwgat-tpu .
# Run (on a TPU VM, exposing the accelerator):
#   docker run --privileged --net=host -v $PWD/input:/app/input sl-hwgat-tpu \
#       python main.py -m train -d FDMSE -t v1
FROM ubuntu:22.04

USER root
ENV DEBIAN_FRONTEND=noninteractive

RUN apt-get update && apt-get install -y --no-install-recommends \
        python3.12 python3.12-dev python3-pip python3.12-venv \
        build-essential curl ca-certificates \
    && rm -rf /var/lib/apt/lists/* \
    && update-alternatives --install /usr/bin/python python /usr/bin/python3.12 1

RUN python -m venv /opt/venv
ENV PATH=/opt/venv/bin:$PATH

# Core TPU stack: jax + libtpu from the TPU release index. Versions pinned to
# the stack this framework is validated against.
RUN pip install --no-cache-dir -U pip && \
    pip install --no-cache-dir \
        "jax[tpu]==0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir \
        flax optax orbax-checkpoint chex einops numpy matplotlib

# CPU torch: only needed for `.pt` checkpoint import / parity tests
# (`pip install .[torch-import]` equivalent).
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /app
COPY pyproject.toml main.py bench.py ./
COPY sl_hwgat_tpu ./sl_hwgat_tpu
RUN pip install --no-cache-dir -e .

# Optional extras (pose backends need mediapipe / mmpose — heavy; opt in):
#   pip install -e .[pose]         # mediapipe holistic
#   pip install -e .[pose-mmpose]  # DWPose / RTMWPose
#   pip install -e .[video]        # decord mp4 decoding

ENTRYPOINT []
CMD ["python", "main.py", "--help"]
