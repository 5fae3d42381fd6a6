# viterbi_spl_tpu build/test entry points

.PHONY: test test-fast native bench tpu-validate tpu-train-smoke clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow" -x

native:
	python -c "from viterbi_spl_tpu.native import build_native; print(build_native(force=True))"

bench:
	python bench.py

tpu-validate:
	python scripts/tpu_validate.py

tpu-train-smoke:
	python scripts/tpu_train_smoke.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f viterbi_spl_tpu/native/libviterbi_native.so
