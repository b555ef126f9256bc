# Development targets (parity with the reference's Makefile: lint + tests).

.PHONY: tests lint native bench clean

tests:
	python -m pytest tests -q

lint:
	-ruff check arnoldi_tpu tests bench.py __graft_entry__.py

native:
	python -c "from arnoldi_tpu.native import dense_tier as d; assert d.available(); print('native dense tier built:', d._LIB_PATH)"

bench:
	python bench.py

clean:
	rm -rf build *.egg-info arnoldi_tpu/native/libdense_tier.so
	find . -name __pycache__ -type d -exec rm -rf {} +
