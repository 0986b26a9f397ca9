"""Native (C++) data-pipeline kernels with ctypes bindings."""
