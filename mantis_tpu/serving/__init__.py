from mantis_tpu.serving.server import ChatAPIServer, make_server

__all__ = ["ChatAPIServer", "make_server"]
