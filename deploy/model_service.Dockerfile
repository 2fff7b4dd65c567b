# Model-serving service image (reference model_cloudrun/Dockerfile: TF CPU
# + gunicorn 1x1).  JAX CPU by default; point at a TPU runtime for
# accelerated serving.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy tensorstore \
    requests google-cloud-storage

WORKDIR /app
COPY transfer_em_tpu /app/transfer_em_tpu

# MODEL_BUCKET: model root (local dir or gs://bucket), layout <name>/<version>/
ENV PORT=8080 MODEL_BUCKET=/models
CMD ["python", "-m", "transfer_em_tpu.serve.model_service"]
