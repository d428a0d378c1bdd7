.PHONY: test dist bench scaling clean

test:
	python -m pytest -x -q tests/

# package for spark-submit --py-files
dist:
	mkdir -p dist
	cd . && zip -qr dist/clip_retrieval_spark.zip clip_retrieval_spark \
		-x '*__pycache__*'
	@echo dist/clip_retrieval_spark.zip

bench:
	python bench.py

scaling:
	python jobs/bench_scaling.py

clean:
	rm -rf dist .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
