# Test-runner image for the compose live-broker path (docker-compose.yml).
# PySpark needs a JVM; confluent-kafka drives the producer side of the
# integration tests. The source tree is bind-mounted at /code by compose,
# so the image only carries the runtime.
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

COPY pyproject.toml README.md /tmp/pkg/
COPY motorway_spark /tmp/pkg/motorway_spark
RUN pip install --no-cache-dir "/tmp/pkg[dev]" confluent-kafka && rm -rf /tmp/pkg

WORKDIR /code
