from turborc_tpu.codecs import registry  # noqa: F401
