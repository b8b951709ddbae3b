# Serving image for lightly-ocr-tpu (counterpart of ocr/Dockerfile:
# base + code + EXPOSE 5000 + server CMD). Use a JAX TPU base image in
# production; python:3.12 + pip jax[tpu] shown here.
FROM python:3.12-slim

WORKDIR /app

RUN pip install --no-cache-dir "jax[tpu]" flax optax orbax-checkpoint \
    einops numpy pyyaml pillow \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY lightly_ocr_tpu/ lightly_ocr_tpu/
COPY native/ native/
COPY pyproject.toml README.md ./

# build the native post-processing library if a toolchain is present
RUN command -v g++ >/dev/null && make -C native || true

# reference checkpoints (save_models/CRAFT.pth, save_models/CRNN.pth)
# are mounted or baked in at deploy time
EXPOSE 5000
CMD ["python", "-m", "lightly_ocr_tpu.serving.server", "--port", "5000"]
