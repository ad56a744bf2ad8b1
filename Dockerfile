# inputlayer-spark server image.
#
# Role parity with the reference's Dockerfile (multi-stage Rust/Node
# build -> slim runtime, non-root user, /health healthcheck, env-driven
# config): here the runtime is Python + a headless JRE for Spark
# local-mode, and the package installs from the repo's pyproject.
# Build:  docker build -t inputlayer-spark .
# Run:    docker run -p 8080:8080 -v inputlayer-data:/var/lib/inputlayer/data inputlayer-spark

FROM python:3.11-slim-bookworm

# Spark needs a JVM; curl feeds the healthcheck.
RUN apt-get update && \
    apt-get install -y --no-install-recommends default-jre-headless curl && \
    rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/default-java

RUN useradd -r -s /bin/false -m -d /var/lib/inputlayer inputlayer

WORKDIR /opt/inputlayer
COPY pyproject.toml README.md ./
COPY inputlayer_spark/ ./inputlayer_spark/
RUN pip install --no-cache-dir .

COPY docs/ /opt/inputlayer/docs/
ENV SPARK_GRAFT_DOCS_DIR=/opt/inputlayer/docs
COPY config.example.toml /etc/inputlayer/config.toml
COPY docker/entrypoint.sh /usr/local/bin/entrypoint.sh
RUN chmod +x /usr/local/bin/entrypoint.sh && \
    mkdir -p /var/lib/inputlayer/data && \
    chown -R inputlayer:inputlayer /var/lib/inputlayer /etc/inputlayer

# Config resolution (docker/entrypoint.sh): SPARK_GRAFT_CONFIG names the
# config.toml (mounted or baked); INPUTLAYER_SECTION__KEY env vars
# override individual keys on top, exactly like the host install.
ENV SPARK_GRAFT_CONFIG=/etc/inputlayer/config.toml
ENV INPUTLAYER_HTTP__HOST=0.0.0.0
ENV INPUTLAYER_HTTP__PORT=8080
ENV INPUTLAYER_STORAGE__DATA_DIR=/var/lib/inputlayer/data
ENV INPUTLAYER_STORAGE__AUTO_CREATE_KNOWLEDGE_GRAPHS=true
ENV INPUTLAYER_LOGGING__LEVEL=warn

EXPOSE 8080
USER inputlayer
WORKDIR /var/lib/inputlayer

HEALTHCHECK --interval=10s --timeout=3s --start-period=30s --retries=3 \
    CMD curl -sf http://localhost:8080/health || exit 1

ENTRYPOINT ["entrypoint.sh"]
