from videoquery.testing.fake_api import FakeAPI, FakeClient

__all__ = ["FakeAPI", "FakeClient"]
