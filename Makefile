# Build/test entry points (the reference's justfile analog).

PY ?= python
NATIVE_SRCS = native/hotloops.cpp native/decoder.cpp native/broccoli.cpp \
              native/storeblock.cpp native/capi.cpp native/workpool.cpp \
              native/zopfli_hq.cpp

.PHONY: test native capi-demo bench ci clean

test:
	$(PY) -m pytest tests/ -q

# the package builds this lazily on import; explicit target for CI
native: native/libbrotli_tpu_native.so

native/libbrotli_tpu_native.so: $(NATIVE_SRCS) native/dict_embed.inc
	g++ -O3 -march=native -shared -fPIC -pthread $(NATIVE_SRCS) \
	    -o $@.tmp && mv $@.tmp $@

native/dict_embed.inc: tools/gen_dict_inc.py
	$(PY) tools/gen_dict_inc.py

capi-demo: native
	gcc examples/c_demo.c -Iinclude native/libbrotli_tpu_native.so \
	    -o /tmp/brotli_tpu_c_demo
	/tmp/brotli_tpu_c_demo /root/reference/testdata/alice29.txt 9

bench:
	$(PY) bench.py

ci: native test capi-demo

clean:
	rm -f native/libbrotli_tpu_native.so native/libbrotli_tpu_native.so.hash
