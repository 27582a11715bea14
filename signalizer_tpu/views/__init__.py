from signalizer_tpu.views.spectrum import SpectrumProcessor  # noqa: F401
