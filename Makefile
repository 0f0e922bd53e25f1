# Convenience targets (reference analog: Makefile, whose `run` target
# renders scenes/sample.pbrt and collects the EXRs into output/).
SCENE ?= /root/reference/scenes/sample.pbrt

.PHONY: run test test-full bench cat refbuild

run:
	mkdir -p output
	python -m tpurt.cli $(SCENE) --outfile output/$(notdir $(basename $(SCENE))).exr

# quick gate: excludes @pytest.mark.full and everything listed in
# tests/slow_full.txt (render-loop tests); never builds the C++
# reference — parity tests skip unless the binary is already present
test:
	TPURT_SKIP_REFBUILD=1 python -m pytest tests/ -q -m "not full"

# the whole suite, including the slow render gates and the C++-binary
# parity tests (shim-builds the reference binaries first)
test-full: refbuild
	python -m pytest tests/ -q

# shim-build the C++ reference binaries (pbrt, pbrt-patched, imgtool)
# used by the default-on pixel-parity gate (tests/test_cpp_parity.py)
refbuild:
	$(MAKE) -C refbuild all patched sampled

bench:
	python bench.py

cat:
	python -m tpurt.cli --cat $(SCENE)
