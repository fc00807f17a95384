# Common entry points (see README.md / PARITY.md)

.PHONY: test test-fast bench dryrun synth-eval native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

synth-eval:
	python tools/run_synthetic_eval.py --workdir /tmp/tdvnet_synth_eval

native:
	g++ -O3 -shared -fPIC -o native/librasterizer.so native/rasterizer.cpp

clean:
	rm -rf runs eval_results .pytest_cache native/librasterizer.so
	find . -name __pycache__ -type d -exec rm -rf {} +
