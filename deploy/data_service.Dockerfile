# Data-access service image (reference cloudrun_functions/Dockerfile:
# gcc:9.3 base + gunicorn 9 workers x 2 threads).  The stdlib prefork server
# replaces Flask/gunicorn: DATA_WORKERS processes accept from one shared
# listening socket, each threaded — measured 2.0x a single threaded process
# on a 16-client /volume+/slice fleet (PERF.md "Serving fleet").
FROM python:3.12-slim

RUN pip install --no-cache-dir numpy pillow tensorstore requests

WORKDIR /app
COPY transfer_em_tpu /app/transfer_em_tpu

ENV PORT=8080
ENV DATA_WORKERS=8
CMD ["python", "-m", "transfer_em_tpu.serve.data_service"]
