# Top-level convenience targets.

.PHONY: native test bench validate evidence clean

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

validate:
	python scripts/tpu_validation.py

# on-chip evidence refresh: standing truth checks -> dated docs/ab_logs/*.log
evidence:
	bash scripts/evidence.sh

clean:
	$(MAKE) -C native clean
