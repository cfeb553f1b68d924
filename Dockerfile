# Container image for OutGridViT-TPU (mirrors the reference's Dockerfile
# surface, `/root/reference/Dockerfile:1-16`, swapped onto the JAX TPU stack).
FROM python:3.12-slim

WORKDIR /app

COPY requirements.txt .
# On a TPU VM install the TPU-enabled jaxlib instead:
#   pip install -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -r requirements.txt

COPY outgridvit_tpu/ outgridvit_tpu/
COPY scripts/ scripts/
COPY configs/ configs/
COPY bench.py .

CMD ["python", "scripts/train.py", "--config", "configs/train.yaml"]
