# Top-level convenience targets.

.PHONY: native test bench validate clean

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

validate:
	python scripts/tpu_validation.py

clean:
	$(MAKE) -C native clean
