"""Reference-compatible CLI shim: ``python main.py -m train -d <ds> --model <name>``.
≡ `hwgat/main.py`. Delegates to :mod:`sl_hwgat_tpu.cli`."""

from sl_hwgat_tpu.cli import main

if __name__ == "__main__":
    main()
