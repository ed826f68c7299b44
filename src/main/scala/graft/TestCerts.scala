package graft

/** Reference conformance fixtures (FIXTURES.md §A) — PEM certificate
  * DATA carried over from /root/reference/storage test files (cited per
  * fixture); implementation-independent truths shared by the specs. */
object TestCerts {
  /** Cert with serial 0x00AA (reference storage/types_test.go:22-38). */
  val kLeadingZeroes: String =
    """-----BEGIN CERTIFICATE-----
      |MIICozCCAYugAwIBAgICAKowDQYJKoZIhvcNAQELBQAwDTELMAkGA1UEAwwCY2Ew
      |IhgPMjAxNzExMjcwMDAwMDBaGA8yMDIwMDIwNTAwMDAwMFowGDEWMBQGA1UEAwwN
      |IGxlYWRpbmdaZXJvczCCASIwDQYJKoZIhvcNAQEBBQADggEPADCCAQoCggEBALqI
      |UahEjhbWQf1utogGNhA9PBPZ6uQ1SrTs9WhXbCR7wcclqODYH72xnAabbhqG8mvi
      |r1p1a2pkcQh6pVqnRYf3HNUknAJ+zUP8HmnQOCApk6sgw0nk27lMwmtsDu0Vgg/x
      |fq1pGrHTAjqLKkHup3DgDw2N/WYLK7AkkqR9uYhheZCxV5A90jvF4LhIH6g304hD
      |7ycW2FW3ZlqqfgKQLzp7EIAGJMwcbJetlmFbt+KWEsB1MaMMkd20yvf8rR0l0wnv
      |uRcOp2jhs3svIm9p47SKlWEd7ibWJZ2rkQhONsscJAQsvxaLL+Xxj5kXMbiz/kkj
      |+nJRxDHVA6zaGAo17Y0CAwEAATANBgkqhkiG9w0BAQsFAAOCAQEAGGxF47xA91w0
      |JvJ9kMGyiTqwtU7RaCXW+euVrFq8fFqE6+Gy+EnAQkNvzAjgHBoboodsost7xwuq
      |JG/LoF6qUsztYVpGHtpElghTv6XXhMCh0zaoM0PrE5oXYY75di+ltEH1DJVf0xj0
      |30AK23vyZ+UsNwISUyzECxA10RUSAD697vFIqW9RrJG1fM6f3l/VRBLINqOafrNB
      |z6brFHZzowdAKMBkog7ZQyiHEi1BqV8Vd8SKng2lQNw67RFgfB2Ltgbew2SiZMor
      |ylxqvBshawlL7jExLaSnMgE0RvcvSjpDguO7QO84CtH2LDGYjBABfy9ShGWTsKHi
      |Tqhe91GhlQ==
      |-----END CERTIFICATE-----""".stripMargin

  /** CA cert with no SubjectKeyId (storage/filesystemdatabase_test.go:17-33). */
  val kEmptySPKI: String =
    """-----BEGIN CERTIFICATE-----
      |MIICyTCCAbGgAwIBAgIURxOdvmKY1LMeejuRTiuHeGBhZHwwDQYJKoZIhvcNAQEL
      |BQAwDTELMAkGA1UEAwwCY2EwIhgPMjAxNjExMjcwMDAwMDBaGA8yMDE5MDIwNTAw
      |MDAwMFowDTELMAkGA1UEAwwCY2EwggEiMA0GCSqGSIb3DQEBAQUAA4IBDwAwggEK
      |AoIBAQC6iFGoRI4W1kH9braIBjYQPTwT2erkNUq07PVoV2wke8HHJajg2B+9sZwG
      |m24ahvJr4q9adWtqZHEIeqVap0WH9xzVJJwCfs1D/B5p0DggKZOrIMNJ5Nu5TMJr
      |bA7tFYIP8X6taRqx0wI6iypB7qdw4A8Njf1mCyuwJJKkfbmIYXmQsVeQPdI7xeC4
      |SB+oN9OIQ+8nFthVt2Zaqn4CkC86exCABiTMHGyXrZZhW7filhLAdTGjDJHdtMr3
      |/K0dJdMJ77kXDqdo4bN7LyJvaeO0ipVhHe4m1iWdq5EITjbLHCQELL8Wiy/l8Y+Z
      |FzG4s/5JI/pyUcQx1QOs2hgKNe2NAgMBAAGjHTAbMAwGA1UdEwQFMAMBAf8wCwYD
      |VR0PBAQDAgEGMA0GCSqGSIb3DQEBCwUAA4IBAQBXd3Rnz2WW+aczo/SPlYSst4Bp
      |hWx6S3ncLB4RznGMCTndfJCkpOdkDvDi9swIN4xO19XlUJFX5FiJ9vbjrxgz1hV9
      |/FsqApPRAMuA6cWMOFWtIu/qgurcCMpgcPyO6MKGR1YH1C2fpVIDIDc/ID7sIpLt
      |m208pK6P9J61ka0QqjQkQZ1aDulBj+6Ic5GYwyJXAWyE3OoUJPteGM12yfT/7lOC
      |ObxJaqJrOYQEmI2ZZQ67MjDgfvivopIFQKOJvlBJKHujDSz3ZFykwx7CwnvN74sJ
      |07snm4Vz6lAKESVa4H65oExOqL1kEMQQKyNmOKEAMOmHM+L4toh17ax4q2xP
      |-----END CERTIFICATE-----""".stripMargin

  /** WISeKey CA cert with a real SubjectKeyId and CRL DP
    * (storage/filesystemdatabase_test.go:35-64). */
  val kRealSPKI: String =
    """-----BEGIN CERTIFICATE-----
      |MIIFDTCCA/WgAwIBAgIKEuOBUwAAAAAAHTANBgkqhkiG9w0BAQUFADCBijELMAkG
      |A1UEBhMCQ0gxEDAOBgNVBAoTB1dJU2VLZXkxJjAkBgNVBAsTHUNvcHlyaWdodCAo
      |YykgMjAwNSBXSVNlS2V5IFNBMRYwFAYDVQQLEw1JbnRlcm5hdGlvbmFsMSkwJwYD
      |VQQDEyBXSVNlS2V5IENlcnRpZnlJRCBTdGFuZGFyZCBHMSBDQTAeFw0xMjAxMjMx
      |NTMyMjBaFw0yMDEyMjMxMDU1MzJaMIGSMQswCQYDVQQGEwJDSDEQMA4GA1UEChMH
      |V0lTZUtleTEmMCQGA1UECxMdQ29weXJpZ2h0IChjKSAyMDEyIFdJU2VLZXkgU0Ex
      |FjAUBgNVBAsTDUludGVybmF0aW9uYWwxMTAvBgNVBAMTKFdJU2VLZXkgQ2VydGlm
      |eUlEIFN0YW5kYXJkIFNlcnZpY2VzIENBIDIwggEiMA0GCSqGSIb3DQEBAQUAA4IB
      |DwAwggEKAoIBAQDEwRJCD5mtCZwFwgKi/6mQYZYKdnw6iJd3RRUQYaJ3BQ13Mw2R
      |W+YAkWn7TjawcRb7wGpC/16KDaEM13d5As61egVZsXb4cgI1xLZI4ok9tlh+SHm6
      |SX38HCcOKg4YT43xcq1b5pcerhp5/HsI+wovic2WIuA/BVD4Tv0t46EP2avjijQP
      |CcRPYhaGLC6dtqfSh0/jcutPJJRG9An29KcPfx137bTkFrQnUZTR0SThkixhWpsY
      |iCVFCazKMHlwUDXKa0m41BI6q01lmDfz1Hfuft5r89ltThCKkTvo//a3gulz43DO
      |9qv5emTHISqZXOi8fRCWa05TP5Q+AK5RhjTPAgMBAAGjggFpMIIBZTASBgNVHRMB
      |Af8ECDAGAQH/AgEAMB0GA1UdDgQWBBS79c6uWyghS9wCtE1Nj7NK4rThkzALBgNV
      |HQ8EBAMCAYYwEAYJKwYBBAGCNxUBBAMCAQAwTgYDVR0gBEcwRTA7BghghXQFDgQC
      |ATAvMC0GCCsGAQUFBwIBFiFodHRwOi8vd3d3Lndpc2VrZXkuY29tL3JlcG9zaXRv
      |cnkwBgYEVR0gADAZBgkrBgEEAYI3FAIEDB4KAFMAdQBiAEMAQTAfBgNVHSMEGDAW
      |gBT62HEyPNzq0jV+X9hk4vH/HGarbTA8BgNVHR8ENTAzMDGgL6AthitodHRwOi8v
      |cHVibGljLndpc2VrZXkuY29tL2NybC93Y2lkc2cxY2EuY3JsMEcGCCsGAQUFBwEB
      |BDswOTA3BggrBgEFBQcwAoYraHR0cDovL3B1YmxpYy53aXNla2V5LmNvbS9jcnQv
      |d2NpZHNnMWNhLmNydDANBgkqhkiG9w0BAQUFAAOCAQEAe0VgXnBsOf3nvyagCyzG
      |G67gxFooo8QrHSYhA0da9TrPh0Jln0FkEh4zN5pA+hgL353tBAYDkPhbcCwW+t50
      |n9R8y3VVaaSCqP2NpU+GTfd/D8OM8sGf7KGFzVh/1Cx2x7whaBZ1w1F/BDX/LEmP
      |4aJX0+2l+XHM7ejbZBv52hqZxHFxY2qTl0bV2WfaDh7UYkqjzkE7HW9vgLD13X5B
      |Daidl1Taa2zjouW/BTuwmD/8WbTSP4KJpblia+2LtzO6VJV/if7wqXZr4UA0kpTY
      |wKo3zx2WdFVsOLYnt/QsOZS8WsdlNR30V/040wPH+F6XNPnTnlw0UxZzt/mnWmeU
      |EA==
      |-----END CERTIFICATE-----""".stripMargin

  /** Synthetic non-CA leaf (generated for this repo with openssl;
    * CA:FALSE, notAfter 2046) — plays the role of the reference's
    * runtime-generated test certs (issuermetadata_test.go:62-98). */
  val kSyntheticLeaf: String =
    """-----BEGIN CERTIFICATE-----
      |MIIDEDCCAfigAwIBAgIUJOlSbGjLf2rKREtCczv/fPBUNK4wDQYJKoZIhvcNAQEL
      |BQAwGTEXMBUGA1UEAwwOc3ludGhldGljIGxlYWYwHhcNMjYwODEyMDcwMjI5WhcN
      |NDYwODA3MDcwMjI5WjAZMRcwFQYDVQQDDA5zeW50aGV0aWMgbGVhZjCCASIwDQYJ
      |KoZIhvcNAQEBBQADggEPADCCAQoCggEBAMEETZSziP3GbRLWH6RAvsj4E8MLcqhD
      |+C8nX/PmrKW6mmrqgWq/ykJg/2/Eov8vspJqbOzwT8L0WxhYpnUsgXNahrYu54dw
      |Q3EqVh1IDs0F7fiVg1L277yvH3tPHYE4LfnT1q0cxkLpbRFoU/J+6JkVSX6T5Fhr
      |Eo0RYJ2WgCEg3XqIqEVrzZ271NXwKd3i1EolLsbZlQWVJ/Q9jucz91P2uLY5RXG3
      |y/TLL5axU8iAxSVo3N+4fpkPkrqLGwGKS4qZGZgI+NXwWHThO4ajVh/bxTtKizV8
      |f6C21sFz81KlsH86ug9UwuCroimOkVvwgUH5G31uk67XhXGFjw+UA0MCAwEAAaNQ
      |ME4wHQYDVR0OBBYEFA2VQSjMGjIhc5UwJ0Vfx9WeEbgTMB8GA1UdIwQYMBaAFA2V
      |QSjMGjIhc5UwJ0Vfx9WeEbgTMAwGA1UdEwEB/wQCMAAwDQYJKoZIhvcNAQELBQAD
      |ggEBALrYn7iMHUe3wMDG6QTC4JU64oXAoC3HFIyjlAdwS9KokL/XS5oeTDsDE7IQ
      |gdya1QEyWk60TiD+jPhZoS/f1PwS51Ap7BanmgD5X61GyXRv4+9erH2y4lNw3ca2
      |RdDJD1gmP9TlvOK44uv2q3q3oHTTKFZeeEIAHMGxmMIW0Yi3R6Y75lCeJ/StXje8
      |vxMjAg3R+NXTBqJz8fxgHhIcVMRV+i6sG+aHM3wlX1gxhOyGfibljj3Gm4XPe8Vr
      |Z8DHbk10hCyEefQ4hfFqOEn9SZUNqrteqYi/KFkbu3P/LTOCa9UaiH6aL3ty4Cm7
      |9RZgKfx4wZJh2yb90eqTVYBP8Uo=
      |-----END CERTIFICATE-----""".stripMargin

  /** Second synthetic non-CA leaf (openssl-generated, CA:FALSE). */
  val kSyntheticLeaf2: String =
    """-----BEGIN CERTIFICATE-----
      |MIIDCjCCAfKgAwIBAgIUCRpYPSHzlHv2EZPuu6X1wgnc8zQwDQYJKoZIhvcNAQEL
      |BQAwFjEUMBIGA1UEAwwLc2Vjb25kIGxlYWYwHhcNMjYwODEyMDcwNDQ3WhcNNDUx
      |MDExMDcwNDQ3WjAWMRQwEgYDVQQDDAtzZWNvbmQgbGVhZjCCASIwDQYJKoZIhvcN
      |AQEBBQADggEPADCCAQoCggEBANZ4b1qGJ1Jcm2CEwfCGy4VOFndjqSFnEGiaj/Vd
      |Rmr4AzFD94NJj9phMRsreG27JCQqBgdkFA57fx/8+EKwWsxaSx499vfbCL0t1Mjw
      |0hlr/dmCW9S0Qw4+XM1qgYhVraCbDp87ckaK9hlDxs4ORfATgSK3VoaXIzJe1J9C
      |erXC/bInC9U0EkQdcXbqOboPOyrvYusZ0nkfoNJLZVW9iyY8l4m7LxJqZv66df/y
      |XpVgC2Qsgk3UGLDhvo2PHy36seYOM1Jqz4Me+Rwb/01pdML6m2v/FuFHMGwpHjKw
      |PYogXzdc+q+AhfH0+1K5ftl9ZHomXBKi07XGaKPpBnNEE9sCAwEAAaNQME4wHQYD
      |VR0OBBYEFJH3WMwkY9N6+eOXMQpyFNBKhfYOMB8GA1UdIwQYMBaAFJH3WMwkY9N6
      |+eOXMQpyFNBKhfYOMAwGA1UdEwEB/wQCMAAwDQYJKoZIhvcNAQELBQADggEBAJIs
      |GW1UeyQ3Zxy94RFZmZAbAfXnAUHDRsy9Gd4DKb2De/QQgq5Zic7lH9kTaeqH+4ob
      |D052tirgfgEi3cPXmVMwPQ8FwE1Fc4NMBRSAWjjkpaeeIFHr2tX7FlA/vOyPNbJw
      |VxIzGXGCvsPk27WEzdCOcEXzYIHUU/bNwVAcQZWZdJ7q/v1CIHilIK6KGfSV7OSc
      |9rltENTjs91oFX7+ssCdTVmB/Tahx6tNVj9UyAK61jrGEKjH1QjXRwD1t311+dF8
      |xrPC47DJPCjztYIaUKzoMcRMnSv+4n8qDiIP81/sswIa87GtF7B4UnYDAz1Cfa4W
      |cbDTA7OaVNheRNAL/tI=
      |-----END CERTIFICATE-----""".stripMargin
}
