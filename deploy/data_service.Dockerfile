# Data-access service image (reference cloudrun_functions/Dockerfile:
# gcc:9.3 base + gunicorn 9 workers x 2 threads).  The stdlib threaded HTTP
# server replaces Flask/gunicorn; concurrency is in-process threads.
FROM python:3.12-slim

RUN pip install --no-cache-dir numpy pillow tensorstore requests

WORKDIR /app
COPY transfer_em_tpu /app/transfer_em_tpu

ENV PORT=8080
CMD ["python", "-m", "transfer_em_tpu.serve.data_service"]
