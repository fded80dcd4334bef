"""Solar position astronomy.

Computes the sun's direction in the local east-north-up frame from a
date/time and geographic location, using the PSA algorithm of Blanco-Muriel
et al. 2001 ("Computing the Solar Vector", Solar Energy 70(5)) — the same
published algorithm the reference uses (`sunsky.h:283-374`), including its
parallax correction. Pure jnp; differentiable w.r.t. the continuous inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .constants import ASTRONOMICAL_UNIT, EARTH_MEAN_RADIUS

TWO_PI = 2.0 * jnp.pi


class DateTimeRecord(NamedTuple):
    year: int = 2010
    month: int = 7
    day: int = 10
    hour: float = 15.0
    minute: float = 0.0
    second: float = 0.0


class LocationRecord(NamedTuple):
    latitude: float = 35.6894    # Tokyo
    longitude: float = 139.6917
    timezone: float = 9.0


def julian_days_since_j2000(dt: DateTimeRecord, timezone) -> jnp.ndarray:
    """Days elapsed since JD 2451545.0 (noon 2000-01-01 UT)."""
    dec_hours = dt.hour - timezone + (dt.minute + dt.second / 60.0) / 60.0
    # Integer Julian-day-number arithmetic (Fliegel & Van Flandern form);
    # must use C-style truncating integer division.
    year = jnp.asarray(dt.year, jnp.int32)
    month = jnp.asarray(dt.month, jnp.int32)
    day = jnp.asarray(dt.day, jnp.int32)

    def cdiv(a, b):  # trunc-toward-zero division as in C
        q = jnp.abs(a) // b
        return jnp.where(a < 0, -q, q)

    aux1 = cdiv(month - 14, 12)
    aux2 = (cdiv(1461 * (year + 4800 + aux1), 4)
            + cdiv(367 * (month - 2 - 12 * aux1), 12)
            - cdiv(3 * cdiv(year + 4900 + aux1, 100), 4)
            + day - 32075)
    julian_date = aux2.astype(jnp.float32) - 0.5 + dec_hours / 24.0
    return julian_date - 2451545.0, dec_hours


def sun_elevation_azimuth(dt: DateTimeRecord, loc: LocationRecord):
    """Return (elevation, azimuth) of the sun in radians.

    Elevation is measured from the horizon; azimuth from north, eastwards
    (the PSA convention).
    """
    elapsed, dec_hours = julian_days_since_j2000(dt, loc.timezone)

    # Ecliptic coordinates
    omega = 2.1429 - 0.0010394594 * elapsed
    mean_longitude = 4.8950630 + 0.017202791698 * elapsed
    anomaly = 6.2400600 + 0.0172019699 * elapsed
    ecliptic_longitude = (mean_longitude + 0.03341607 * jnp.sin(anomaly)
                          + 0.00034894 * jnp.sin(2 * anomaly) - 0.0001134
                          - 0.0000203 * jnp.sin(omega))
    ecliptic_obliquity = (0.4090928 - 6.2140e-9 * elapsed
                          + 0.0000396 * jnp.cos(omega))

    # Celestial coordinates
    sin_el = jnp.sin(ecliptic_longitude)
    dy = jnp.cos(ecliptic_obliquity) * sin_el
    dx = jnp.cos(ecliptic_longitude)
    right_ascension = jnp.arctan2(dy, dx)
    right_ascension = jnp.where(right_ascension < 0,
                                right_ascension + TWO_PI, right_ascension)
    declination = jnp.arcsin(jnp.sin(ecliptic_obliquity) * sin_el)

    # Local horizontal coordinates
    gmst = 6.6974243242 + 0.0657098283 * elapsed + dec_hours
    lmst = jnp.deg2rad(gmst * 15.0 + loc.longitude)
    lat = jnp.deg2rad(loc.latitude)
    hour_angle = lmst - right_ascension
    zenith = jnp.arccos(jnp.cos(lat) * jnp.cos(hour_angle) * jnp.cos(declination)
                        + jnp.sin(declination) * jnp.sin(lat))
    dy = -jnp.sin(hour_angle)
    dx = jnp.tan(declination) * jnp.cos(lat) - jnp.sin(lat) * jnp.cos(hour_angle)
    azimuth = jnp.arctan2(dy, dx)
    azimuth = jnp.where(azimuth < 0, azimuth + TWO_PI, azimuth)

    # Parallax correction (observer on the surface, not the geocenter).
    # NOTE: the PSA paper corrects the *zenith* angle; this form follows it.
    zenith = zenith + (EARTH_MEAN_RADIUS / ASTRONOMICAL_UNIT) * jnp.sin(zenith)

    return zenith, azimuth


def sun_direction(dt: DateTimeRecord, loc: LocationRecord):
    """Sun direction as a unit vector in the local z-up frame.

    Matches the reference's convention `sphdir(zenith, azimuth - pi)`
    (`sunsky.h:373`): x points south, y east, z up.
    """
    zenith, azimuth = sun_elevation_azimuth(dt, loc)
    phi = azimuth - jnp.pi
    st, ct = jnp.sin(zenith), jnp.cos(zenith)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([cp * st, sp * st, ct], axis=-1)
