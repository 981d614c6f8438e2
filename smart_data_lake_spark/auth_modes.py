"""Typed authentication modes for connections and web data objects.

Reference: ``sdl-core/.../workflow/connection/authMode/*.scala`` — a family
of config-instantiable classes (``authMode { type = BasicAuthMode ... }``)
that data objects and connections consume uniformly:

* ``AuthMode.scala`` — base trait with prepare()/close() lifecycle hooks.
* ``BasicAuthMode.scala`` / ``TokenAuthMode.scala`` / ``AuthHeaderMode.scala``
  / ``CustomHttpAuthMode.scala`` — HTTP header producers.
* ``OAuthMode.scala`` — client-credentials grant (oauthUrl/clientId/
  clientSecret/oauthScope).
* ``AWSUserPwdAuthMode.scala`` — AWS Cognito InitiateAuth USER_PASSWORD_AUTH
  over the public ``cognito-idp.<region>.amazonaws.com`` JSON API; bearer is
  the access token (or id token with ``use_id_token``).
* ``SASLSCRAMAuthMode.scala`` / ``SSLCertsAuthMode.scala`` — Kafka security
  coordinates; here they compile to the PUBLIC Kafka client option names
  (``kafka.sasl.*`` / ``kafka.ssl.*``) that Spark's kafka source passes
  through, so a secured cluster is configured with validated, typed fields
  instead of a raw option map.
* ``PublicKeyAuthMode.scala`` — SFTP username, key comes from the agent /
  default identity files (paramiko ``look_for_keys``).

Secret fields accept the ``PROVIDER#name`` convention (``ENV#VAR``,
``FILE#/path``, ``CLEAR#literal`` or custom registered providers) and are
resolved lazily at USE time — mirroring the reference's ``StringOrSecret``
so secrets never sit decoded in config dumps.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from typing import Any, Callable

from smart_data_lake_spark.config import ConfigError, resolve_secret

__all__ = [
    "AuthMode",
    "HttpHeaderAuth",
    "BasicAuthMode",
    "TokenAuthMode",
    "AuthHeaderMode",
    "CustomHttpAuthMode",
    "OAuthMode",
    "AWSUserPwdAuthMode",
    "SASLSCRAMAuthMode",
    "SSLCertsAuthMode",
    "PublicKeyAuthMode",
    "AzureADClientGrantAuthMode",
]


class AuthMode:
    """Base lifecycle (AuthMode.scala:37-49): prepare() runs in the prepare
    phase to validate config / warm tokens; close() after exec."""

    def prepare(self) -> None:  # noqa: B027 — optional hook
        pass

    def close(self) -> None:  # noqa: B027 — optional hook
        pass


class HttpHeaderAuth(AuthMode):
    """HTTP-capable auth modes produce request headers (HttpHeaderAuth
    trait). ``build_headers`` aliases ``get_headers`` for drop-in use where
    the legacy ``HttpAuthMode`` option-bag was accepted."""

    def get_headers(self) -> dict[str, str]:
        raise NotImplementedError

    def build_headers(self) -> dict[str, str]:
        return self.get_headers()


class BasicAuthMode(HttpHeaderAuth):
    """user/password → ``Authorization: Basic`` (BasicAuthMode.scala:30-42)."""

    def __init__(self, user: str, password: str) -> None:
        if not user or password is None:
            raise ConfigError("BasicAuthMode requires user and password")
        self.user = user
        self.password = password

    def get_headers(self) -> dict[str, str]:
        import base64

        cred = f"{resolve_secret(self.user)}:{resolve_secret(self.password)}"
        return {"Authorization": "Basic " + base64.b64encode(cred.encode()).decode()}


class TokenAuthMode(HttpHeaderAuth):
    """Static token → ``Authorization: <type> <token>`` (TokenAuthMode.scala)."""

    def __init__(self, token: str, token_type: str = "Bearer") -> None:
        if not token:
            raise ConfigError("TokenAuthMode requires token")
        self.token = token
        self.token_type = token_type

    def get_headers(self) -> dict[str, str]:
        return {"Authorization": f"{self.token_type} {resolve_secret(self.token)}"}


class AuthHeaderMode(HttpHeaderAuth):
    """Arbitrary header name carrying a secret (AuthHeaderMode.scala:36-44)."""

    def __init__(self, header_name: str, secret: str) -> None:
        if not header_name or secret is None:
            raise ConfigError("AuthHeaderMode requires header_name and secret")
        self.header_name = header_name
        self.secret = secret

    def get_headers(self) -> dict[str, str]:
        return {self.header_name: resolve_secret(self.secret)}


class CustomHttpAuthMode(HttpHeaderAuth):
    """Delegate to a user class by dotted path implementing
    ``prepare(options)`` / ``get_headers()`` (CustomHttpAuthMode.scala:
    CustomHttpAuthModeLogic)."""

    def __init__(self, class_name: str, options: dict[str, str] | None = None) -> None:
        if not class_name:
            raise ConfigError("CustomHttpAuthMode requires class_name")
        self.class_name = class_name
        self.options = options or {}
        self._impl: Any = None

    def _instance(self) -> Any:
        if self._impl is None:
            import importlib

            mod_name, _, cls_name = self.class_name.rpartition(".")
            if not mod_name:
                raise ConfigError(
                    f"CustomHttpAuthMode class_name must be a dotted path, got {self.class_name!r}"
                )
            cls = getattr(importlib.import_module(mod_name), cls_name)
            self._impl = cls()
            if hasattr(self._impl, "prepare"):
                self._impl.prepare({k: resolve_secret(v) for k, v in self.options.items()})
        return self._impl

    def prepare(self) -> None:
        self._instance()

    def get_headers(self) -> dict[str, str]:
        return dict(self._instance().get_headers())


class _CachedTokenAuth(HttpHeaderAuth):
    """Shared bearer-token cache: refresh 30 s before expiry (the
    reference's OAuth2Service keeps one token per service the same way)."""

    def __init__(self) -> None:
        self._token: str | None = None
        self._expiry: float = 0.0

    def _fetch(self) -> tuple[str, float]:  # (token, expires_in_sec)
        raise NotImplementedError

    def _bearer(self) -> str:
        if self._token is None or time.monotonic() >= self._expiry - 30:
            token, expires_in = self._fetch()
            self._token = token
            self._expiry = time.monotonic() + expires_in
        return self._token

    def get_headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self._bearer()}"}

    def prepare(self) -> None:
        self._bearer()

    def close(self) -> None:
        self._token = None
        self._expiry = 0.0


class OAuthMode(_CachedTokenAuth):
    """OAuth2 client-credentials grant (OAuthMode.scala:32-37: oauthUrl,
    clientId, clientSecret, oauthScope)."""

    def __init__(
        self,
        oauth_url: str,
        client_id: str,
        client_secret: str,
        oauth_scope: str = "",
    ) -> None:
        super().__init__()
        if not oauth_url or not client_id or client_secret is None:
            raise ConfigError("OAuthMode requires oauth_url, client_id and client_secret")
        self.oauth_url = oauth_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.oauth_scope = oauth_scope

    def _fetch(self) -> tuple[str, float]:
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": resolve_secret(self.client_id),
                "client_secret": resolve_secret(self.client_secret),
                "scope": resolve_secret(self.oauth_scope) if self.oauth_scope else "",
            }
        ).encode("utf-8")
        req = urllib.request.Request(
            self.oauth_url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["access_token"], float(payload.get("expires_in", 3600))


class AWSUserPwdAuthMode(_CachedTokenAuth):
    """AWS Cognito USER_PASSWORD_AUTH (AWSUserPwdAuthMode.scala:60-90): POST
    ``InitiateAuth`` to the public ``cognito-idp`` JSON API; the bearer is
    the returned access token (or id token with ``use_id_token``).
    ``endpoint`` is overridable for tests — the wire format is the public
    ``X-Amz-Target: AWSCognitoIdentityProviderService.InitiateAuth`` call."""

    def __init__(
        self,
        region: str,
        user_pool: str,
        client_id: str,
        user: str,
        password: str,
        use_id_token: bool = False,
        endpoint: str | None = None,
    ) -> None:
        super().__init__()
        if not region or not client_id or not user or password is None:
            raise ConfigError("AWSUserPwdAuthMode requires region, client_id, user, password")
        self.region = region
        self.user_pool = user_pool
        self.client_id = client_id
        self.user = user
        self.password = password
        self.use_id_token = use_id_token
        self.endpoint = endpoint or f"https://cognito-idp.{region}.amazonaws.com"

    def _fetch(self) -> tuple[str, float]:
        body = json.dumps(
            {
                "ClientId": resolve_secret(self.client_id),
                "AuthFlow": "USER_PASSWORD_AUTH",
                "AuthParameters": {
                    "USERNAME": resolve_secret(self.user),
                    "PASSWORD": resolve_secret(self.password),
                },
            }
        ).encode("utf-8")
        req = urllib.request.Request(
            self.endpoint,
            data=body,
            headers={
                "X-Amz-Target": "AWSCognitoIdentityProviderService.InitiateAuth",
                "Content-Type": "application/x-amz-json-1.1",
                "Accept": "application/json",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        result = payload["AuthenticationResult"]
        token = result["IdToken"] if self.use_id_token else result["AccessToken"]
        return token, float(result.get("ExpiresIn", 3600))


class SASLSCRAMAuthMode(AuthMode):
    """Kafka SASL/SCRAM over SSL (SASLSCRAMAuthMode.scala:33-41), compiled
    to the public Kafka client configs Spark's kafka source passes through
    (option names from the Apache Kafka documentation)."""

    _MECHANISMS = ("SCRAM-SHA-256", "SCRAM-SHA-512", "PLAIN")

    def __init__(
        self,
        username: str,
        password: str,
        ssl_mechanism: str = "SCRAM-SHA-512",
        truststore_path: str | None = None,
        truststore_type: str = "JKS",
        truststore_pass: str | None = None,
    ) -> None:
        if not username or password is None:
            raise ConfigError("SASLSCRAMAuthMode requires username and password")
        if ssl_mechanism.upper() not in self._MECHANISMS:
            raise ConfigError(
                f"SASLSCRAMAuthMode ssl_mechanism must be one of {self._MECHANISMS}, got {ssl_mechanism!r}"
            )
        self.username = username
        self.password = password
        self.ssl_mechanism = ssl_mechanism.upper()
        self.truststore_path = truststore_path
        self.truststore_type = truststore_type
        self.truststore_pass = truststore_pass

    def kafka_options(self) -> dict[str, str]:
        module = (
            "org.apache.kafka.common.security.plain.PlainLoginModule"
            if self.ssl_mechanism == "PLAIN"
            else "org.apache.kafka.common.security.scram.ScramLoginModule"
        )
        # backslashes FIRST, then quotes — a trailing backslash would
        # otherwise escape the closing quote and corrupt the JAAS config
        def _jaas_escape(s: str) -> str:
            return s.replace("\\", "\\\\").replace('"', '\\"')

        user = _jaas_escape(resolve_secret(self.username))
        pwd = _jaas_escape(resolve_secret(self.password))
        opts = {
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": self.ssl_mechanism,
            "kafka.sasl.jaas.config": f'{module} required username="{user}" password="{pwd}";',
        }
        if self.truststore_path:
            opts["kafka.ssl.truststore.location"] = self.truststore_path
            opts["kafka.ssl.truststore.type"] = self.truststore_type
            if self.truststore_pass is not None:
                opts["kafka.ssl.truststore.password"] = resolve_secret(self.truststore_pass)
        return opts


class SSLCertsAuthMode(AuthMode):
    """Kafka mutual-TLS (SSLCertsAuthMode.scala:33-41): keystore holds the
    client cert, truststore the CA."""

    def __init__(
        self,
        keystore_path: str,
        keystore_pass: str,
        truststore_path: str,
        truststore_pass: str,
        keystore_type: str = "JKS",
        truststore_type: str = "JKS",
    ) -> None:
        if not keystore_path or not truststore_path:
            raise ConfigError("SSLCertsAuthMode requires keystore_path and truststore_path")
        self.keystore_path = keystore_path
        self.keystore_pass = keystore_pass
        self.keystore_type = keystore_type
        self.truststore_path = truststore_path
        self.truststore_pass = truststore_pass
        self.truststore_type = truststore_type

    def kafka_options(self) -> dict[str, str]:
        return {
            "kafka.security.protocol": "SSL",
            "kafka.ssl.keystore.location": self.keystore_path,
            "kafka.ssl.keystore.type": self.keystore_type,
            "kafka.ssl.keystore.password": resolve_secret(self.keystore_pass),
            "kafka.ssl.truststore.location": self.truststore_path,
            "kafka.ssl.truststore.type": self.truststore_type,
            "kafka.ssl.truststore.password": resolve_secret(self.truststore_pass),
        }


class PublicKeyAuthMode(AuthMode):
    """SFTP public-key auth (PublicKeyAuthMode.scala:30-36): only the user
    is configured; the private key comes from the SSH agent or the default
    identity files (paramiko ``allow_agent``/``look_for_keys``)."""

    def __init__(self, user: str) -> None:
        if not user:
            raise ConfigError("PublicKeyAuthMode requires user")
        self.user = user

    def sftp_connect_kwargs(self) -> dict[str, Any]:
        return {
            "username": resolve_secret(self.user),
            "password": None,
            "allow_agent": True,
            "look_for_keys": True,
        }


class AzureADClientGrantAuthMode(OAuthMode):
    """AAD client-credentials grant (sdl-azure AzureADClientGrantAuthMode
    .scala:30-45): authority + applicationId + clientSecret + scope. The
    reference calls MSAL's ConfidentialClientApplication; the token request
    it issues is the standard OAuth2 client-credentials POST to
    ``{authority}/oauth2/v2.0/token``, which :class:`OAuthMode` already
    speaks — this subclass just maps the AAD field names."""

    def __init__(self, authority: str, application_id: str, client_secret: str, scope: str) -> None:
        if not authority:
            raise ConfigError("AzureADClientGrantAuthMode requires authority")
        token_url = authority.rstrip("/")
        if not token_url.endswith("/token"):
            token_url = token_url + "/oauth2/v2.0/token"
        super().__init__(
            oauth_url=token_url,
            client_id=application_id,
            client_secret=client_secret,
            oauth_scope=scope,
        )
        self.authority = authority
