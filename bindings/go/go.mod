module github.com/brotli-tpu/bindings/go

go 1.19
