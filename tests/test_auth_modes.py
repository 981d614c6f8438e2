"""Typed auth-mode family (reference: workflow/connection/authMode/*.scala).

Config round-trip per mode, secret resolution, Kafka option compilation,
mocked-endpoint token flows (the Splunk pattern: stdlib HTTP server speaking
the real wire format), and schema-export visibility.
"""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.auth_modes import (
    AuthHeaderMode,
    AWSUserPwdAuthMode,
    BasicAuthMode,
    CustomHttpAuthMode,
    OAuthMode,
    PublicKeyAuthMode,
    SASLSCRAMAuthMode,
    SSLCertsAuthMode,
    TokenAuthMode,
)
from smart_data_lake_spark.config import ConfigError, _instantiate_nested


# --------------------------------------------------------- config round-trip


@pytest.mark.parametrize(
    "spec, cls, probe",
    [
        ({"type": "BasicAuthMode", "user": "u", "password": "p"}, BasicAuthMode,
         lambda m: m.get_headers()["Authorization"].startswith("Basic ")),
        ({"type": "TokenAuthMode", "token": "t0k"}, TokenAuthMode,
         lambda m: m.get_headers() == {"Authorization": "Bearer t0k"}),
        ({"type": "AuthHeaderMode", "headerName": "X-Api-Key", "secret": "s"}, AuthHeaderMode,
         lambda m: m.get_headers() == {"X-Api-Key": "s"}),
        ({"type": "SASLSCRAMAuthMode", "username": "u", "password": "p",
          "sslMechanism": "SCRAM-SHA-256"}, SASLSCRAMAuthMode,
         lambda m: m.kafka_options()["kafka.sasl.mechanism"] == "SCRAM-SHA-256"),
        ({"type": "SSLCertsAuthMode", "keystorePath": "/k.jks", "keystorePass": "kp",
          "truststorePath": "/t.jks", "truststorePass": "tp"}, SSLCertsAuthMode,
         lambda m: m.kafka_options()["kafka.security.protocol"] == "SSL"),
        ({"type": "PublicKeyAuthMode", "user": "deploy"}, PublicKeyAuthMode,
         lambda m: m.sftp_connect_kwargs()["look_for_keys"] is True),
        ({"type": "OAuthMode", "oauthUrl": "http://x/token", "clientId": "c",
          "clientSecret": "s"}, OAuthMode, lambda m: m.oauth_url == "http://x/token"),
        ({"type": "AWSUserPwdAuthMode", "region": "eu-west-1", "userPool": "pool",
          "clientId": "c", "user": "u", "password": "p"}, AWSUserPwdAuthMode,
         lambda m: "cognito-idp.eu-west-1" in m.endpoint),
    ],
)
def test_config_roundtrip(spec, cls, probe):
    mode = _instantiate_nested(spec)
    assert isinstance(mode, cls)
    assert probe(mode)


def test_missing_required_fields_raise():
    with pytest.raises(Exception):
        _instantiate_nested({"type": "BasicAuthMode", "user": "u"})
    with pytest.raises(ConfigError):
        SASLSCRAMAuthMode(username="u", password="p", ssl_mechanism="GSSAPI-NOPE")
    with pytest.raises(ConfigError):
        TokenAuthMode(token="")


def test_unknown_auth_type_raises():
    with pytest.raises(ConfigError):
        _instantiate_nested({"type": "NoSuchAuthMode"})


# ------------------------------------------------------------------- secrets


def test_secrets_resolved_at_use_time(monkeypatch):
    monkeypatch.setenv("SDL_TEST_PW", "hunter2")
    mode = BasicAuthMode(user="u", password="ENV#SDL_TEST_PW")
    import base64

    hdr = mode.get_headers()["Authorization"]
    assert base64.b64decode(hdr.split()[1]).decode() == "u:hunter2"
    # the raw secret never sits decoded on the instance
    assert mode.password == "ENV#SDL_TEST_PW"


def test_sasl_jaas_escapes_quotes_and_secret():
    mode = SASLSCRAMAuthMode(username="alice", password='p"w')
    jaas = mode.kafka_options()["kafka.sasl.jaas.config"]
    assert 'username="alice"' in jaas and 'password="p\\"w";' in jaas
    assert jaas.startswith("org.apache.kafka.common.security.scram.ScramLoginModule required")


def test_kafka_connection_merges_auth_options():
    from smart_data_lake_spark.dataobjects.kafka import KafkaConnection

    conn = KafkaConnection(
        id="k1",
        brokers="b:9093",
        options={"kafka.ssl.truststore.location": "/override.jks"},
        auth_mode={
            "type": "SASLSCRAMAuthMode",
            "username": "u",
            "password": "p",
            "truststorePath": "/t.jks",
        },
    )
    assert conn.options["kafka.security.protocol"] == "SASL_SSL"
    # explicit options win over compiled auth options
    assert conn.options["kafka.ssl.truststore.location"] == "/override.jks"


def test_kafka_connection_rejects_http_auth():
    from smart_data_lake_spark.dataobjects.kafka import KafkaConnection

    with pytest.raises(ValueError, match="does not apply to Kafka"):
        KafkaConnection(id="k2", brokers="b:9093",
                        auth_mode={"type": "TokenAuthMode", "token": "t"})


def test_sftp_uses_typed_auth():
    from smart_data_lake_spark.dataobjects.web import SFtpFileRefDataObject

    do = SFtpFileRefDataObject(
        id="s1", host="h", path="/in", auth_mode={"type": "PublicKeyAuthMode", "user": "svc"}
    )
    kw = do._connect_kwargs()
    assert kw["username"] == "svc" and kw["password"] is None and kw["allow_agent"]
    do2 = SFtpFileRefDataObject(
        id="s2", host="h", path="/in",
        auth_mode={"type": "BasicAuthMode", "user": "u", "password": "p"},
    )
    kw2 = do2._connect_kwargs()
    assert kw2 == {"username": "u", "password": "p", "allow_agent": False, "look_for_keys": False}


# ----------------------------------------------------- mocked token endpoints


class _TokenHandler(BaseHTTPRequestHandler):
    calls: list[dict] = []

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        record = {"path": self.path, "headers": dict(self.headers), "body": body}
        type(self).calls.append(record)
        if self.headers.get("X-Amz-Target") == "AWSCognitoIdentityProviderService.InitiateAuth":
            payload = json.loads(body)
            assert payload["AuthFlow"] == "USER_PASSWORD_AUTH"
            out = {
                "AuthenticationResult": {
                    "AccessToken": "access-" + payload["AuthParameters"]["USERNAME"],
                    "IdToken": "id-" + payload["AuthParameters"]["USERNAME"],
                    "ExpiresIn": 3600,
                }
            }
        else:
            out = {"access_token": "oauth-token", "expires_in": 3600}
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def token_server():
    _TokenHandler.calls = []
    srv = HTTPServer(("127.0.0.1", 0), _TokenHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_oauth_mode_fetches_and_caches(token_server):
    mode = OAuthMode(oauth_url=token_server + "/token", client_id="c", client_secret="s")
    assert mode.get_headers() == {"Authorization": "Bearer oauth-token"}
    mode.get_headers()
    assert len(_TokenHandler.calls) == 1  # cached until expiry
    sent = _TokenHandler.calls[0]["body"].decode()
    assert "grant_type=client_credentials" in sent and "client_id=c" in sent
    mode.close()
    mode.get_headers()
    assert len(_TokenHandler.calls) == 2  # close() drops the cache


def test_aws_cognito_mode_wire_format(token_server):
    mode = AWSUserPwdAuthMode(
        region="eu-west-1", user_pool="pool", client_id="cid",
        user="alice", password="pw", endpoint=token_server,
    )
    assert mode.get_headers() == {"Authorization": "Bearer access-alice"}
    hdrs = _TokenHandler.calls[0]["headers"]
    assert hdrs["Content-Type"] == "application/x-amz-json-1.1"
    id_mode = AWSUserPwdAuthMode(
        region="eu-west-1", user_pool="pool", client_id="cid",
        user="alice", password="pw", use_id_token=True, endpoint=token_server,
    )
    assert id_mode.get_headers() == {"Authorization": "Bearer id-alice"}


# ------------------------------------------------------------ custom + export


class _MyAuth:
    def prepare(self, options):
        self._key = options["key"]

    def get_headers(self):
        return {"X-Custom": self._key}


def test_custom_http_auth_mode():
    mode = CustomHttpAuthMode(
        class_name=f"{__name__}._MyAuth", options={"key": "v1"}
    )
    assert mode.get_headers() == {"X-Custom": "v1"}


def test_schema_export_lists_auth_modes():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from config_schema import build_schema

    schema = json.dumps(build_schema())
    for name in ("BasicAuthMode", "SASLSCRAMAuthMode", "SSLCertsAuthMode",
                 "PublicKeyAuthMode", "AWSUserPwdAuthMode", "OAuthMode"):
        assert name in schema, name


def test_webservice_accepts_typed_auth_mode():
    from smart_data_lake_spark.dataobjects.web import WebserviceFileDataObject

    do = WebserviceFileDataObject(
        id="w1", url="http://x/api",
        auth_mode={"type": "AuthHeaderMode", "headerName": "X-K", "secret": "v"},
    )
    assert do._headers()["X-K"] == "v"


def test_azure_ad_client_grant_mode(token_server):
    from smart_data_lake_spark.auth_modes import AzureADClientGrantAuthMode

    mode = _instantiate_nested(
        {
            "type": "AzureADClientGrantAuthMode",
            "authority": token_server,  # mock token endpoint (ends with /token after mapping)
            "applicationId": "app1",
            "clientSecret": "s",
            "scope": "https://example/.default",
        }
    )
    assert isinstance(mode, AzureADClientGrantAuthMode)
    assert mode.oauth_url.endswith("/oauth2/v2.0/token")
    # point at the mock exactly and fetch
    mode.oauth_url = token_server + "/token"
    assert mode.get_headers() == {"Authorization": "Bearer oauth-token"}
    body = _TokenHandler.calls[0]["body"].decode()
    assert "client_id=app1" in body and "scope=https%3A%2F%2Fexample%2F.default" in body


def test_webservice_prepare_warms_token(token_server):
    from smart_data_lake_spark.dataobjects.web import WebserviceFileDataObject

    do = WebserviceFileDataObject(
        id="w2", url="http://x/api",
        auth_mode={"type": "OAuthMode", "oauthUrl": token_server + "/token",
                   "clientId": "c", "clientSecret": "s"},
    )
    do.prepare(None)  # warms the token in the prepare phase
    assert len(_TokenHandler.calls) == 1
    do._headers()  # cached — no second fetch
    assert len(_TokenHandler.calls) == 1
    do.post_exec_cleanup()
    do._headers()
    assert len(_TokenHandler.calls) == 2


def test_sasl_jaas_escapes_backslashes():
    """r6 review regression: a trailing backslash must not escape the JAAS
    closing quote."""
    mode = SASLSCRAMAuthMode(username="u", password="p\\")
    jaas = mode.kafka_options()["kafka.sasl.jaas.config"]
    assert 'password="p\\\\";' in jaas  # backslash doubled, quote intact
