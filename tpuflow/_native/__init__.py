"""Native (C++) runtime components, loaded via ctypes.

Build with ``make -C tpuflow/_native``. Importing ``tpuflow._native.codec``
raises ImportError when the shared library is absent; callers fall back to
numpy implementations (tpuflow.io).
"""
