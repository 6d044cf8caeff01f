# Serving container for the estimation web surface (graft.engine.HttpApiMain)
# — the reference's Dockerfile equivalent (/root/reference/docker-compose.yml
# builds a uvicorn app on port 8000; this serves the same route table from
# the JDK HttpServer over a local-mode SparkSession).
#
# Build context expects the packaged library jar:
#   sbt package   ->  target/scala-2.13/flinkestimatorspark_2.13-0.1.0.jar
#
# The official Spark image ships the full Spark 4 classpath + JDK 17, so the
# jar needs no bundled dependencies (the repo builds against the same
# unmanaged /opt/spark/jars classpath).
FROM apache/spark:4.1.2-scala2.13-java17-python3-ubuntu

USER root
RUN mkdir -p /app/saved_estimations && chown -R spark /app
USER spark

COPY target/scala-2.13/flinkestimatorspark_2.13-0.1.0.jar /app/graft.jar

EXPOSE 8000

# Estimate requests are pure driver-side arithmetic (no Spark job); the
# SparkSession only backs the saved-runs persistence endpoints, so a small
# local[4] master is the right size at any request rate.
# python3 (shipped by this base tag) probes /health — the spark base images
# do not install curl.
HEALTHCHECK --interval=30s --timeout=10s --retries=3 --start-period=40s \
  CMD python3 -c "import urllib.request; urllib.request.urlopen('http://localhost:8000/health', timeout=5)" || exit 1

ENTRYPOINT ["/opt/spark/bin/spark-submit", \
  "--master", "local[4]", \
  "--class", "graft.engine.HttpApiMain", \
  "--conf", "spark.ui.enabled=false", \
  "/app/graft.jar", "8000", "/app/saved_estimations"]
