# Developer/ops verb surface, mirroring the reference Makefile's roles
# (test / lint-ish checks / serve / docker lifecycle) over this repo's
# Python entry points. Knobs: SF_DIR (bench/conformance data dir),
# PORT (serve), PYTEST_ARGS.

PYTHON ?= python
SF_DIR ?= /root/testdata/sf0.1
PORT ?= 8080
PYTEST_ARGS ?= -q

.PHONY: all test test-affected test-fast bench conformance ann-recall scale-proof \
        serve repl demo check clean \
        docker docker-run docker-deploy docker-deploy-no-tls \
        docker-logs docker-stop

all: test

# Full suite (the CI gate).
test:
	$(PYTHON) -m pytest tests/ -x $(PYTEST_ARGS)

# Only the tests affected by uncommitted changes (scripts/test-affected.sh).
test-affected:
	sh scripts/test-affected.sh

# Quick iteration loop: skip the slow end-to-end suites.
test-fast:
	$(PYTHON) -m pytest tests/ -x $(PYTEST_ARGS) \
	    --ignore=tests/test_oracle_parity.py \
	    --ignore=tests/test_datalog_differential.py

# Headline-query wall-clock at $(SF_DIR); prints one JSON line.
bench:
	SPARK_GRAFT_SF_DIR=$(SF_DIR) $(PYTHON) bench.py

# Golden-file conformance battery (CONFORMANCE.md categories).
conformance:
	$(PYTHON) conformance.py

# ANN recall curves (LSH / HNSW / IVF vs brute force).
ann-recall:
	$(PYTHON) ann_recall.py

# 1x -> 10x -> 100x scaling evidence (SCALE_r*.json).
scale-proof:
	$(PYTHON) scale_proof.py

# Static sanity: everything importable, entry contract intact.
check:
	$(PYTHON) -c "import inputlayer_spark, __spark_entry__; \
	print('import ok:', len(__spark_entry__.queries()), 'queries,', \
	len(__spark_entry__.oracle_sql()), 'oracles')"

# HTTP/WS server from ./config.toml (+ INPUTLAYER_* env overrides).
serve:
	$(PYTHON) -m inputlayer_spark.server --port $(PORT)

repl:
	$(PYTHON) -m inputlayer_spark

demo:
	$(PYTHON) demo

clean:
	rm -rf spark-warehouse .pytest_cache */__pycache__ __pycache__ \
	    tests/__pycache__ inputlayer_spark/*/__pycache__

# --- Docker lifecycle (role parity with the reference's docker verbs) ---

docker:
	docker build -t inputlayer-spark .

docker-run: docker
	docker run --rm -p $(PORT):8080 inputlayer-spark

docker-deploy:
	docker compose up -d --build

docker-deploy-no-tls:
	docker compose -f docker-compose-no-tls.yml up -d --build

docker-logs:
	docker compose logs -f

docker-stop:
	docker compose down
