package graft.llmops

/** Base64 of small files produced by the reference `bzip2` command-line
  * tool over deterministic generated content (seeded word salad, run
  * ladders, seeded random bytes) — the independent-encoder interop arm
  * for [[Bzip2Spec]].
  */
private[llmops] object Bzip2Fixtures {

  val cliTextL1: String =
    "QlpoMTFBWSZTWVcwZvQAAc3RgAAQQAA////wQAJoDgAIp7QKekaGgAEVP2hoyqggYECjQ0AA" +
    "AAhVKPKfqEfpT1NGmI2Kd581LCy0Yg9jNDT1pkAGoRVVIJmMod2FInURhwwo6EB1bO3blVnQ" +
    "jic+HqYhiuvj2vOl3zMtQ0ryhAwKs07yOJXfhKKoBYb7sha1qR3tgiZNUFY2TNxndkkRmDp7" +
    "csJgq3uU1kueo3UMiWdirVmSNxiZqulxPXg3nAi7Va1JiK2UxfVlxrB7BUbQzRc2cIxKM5Mt" +
    "PiD1G+bs5CLrATQebTqEwypVG5obeHpisgS4rTdwWuyD05Hy0zFERNRQUG6vCJ2FPhU1RfkV" +
    "yr1UdAAyiSp2RJAOnJoqamooiaoJliwicgXID4VNgXrhAOiJlE8KOQXkC+wpu5ZomYIiqkim" +
    "KKMAPCJwrqi6AsiYFNPJBURJJNUETRRRNR9AvhE4QD4AeYAYVOgr3RdxTAL6guBTUANFHmqe" +
    "6idxXIAZdwqqgmipoqiqKqqHYRdVSRTyo+RTUANhBP5F2Rf8XckU4UJBXMGb0A=="

  val cliRunsL9: String =
    "QlpoOTFBWSZTWUcJww0AACNTgewAQCAAED////AAgAAIMAC2BjJiaYTTEwE0wETBT01DQAAA" +
    "CRSMmpppiNGmRkwjhEXt6kI44IW1y9ok6kak0TZd5kZ2JEZ/oV3gED1aL496DDTHwqcFKEMW" +
    "VL0gh0eNBmRCD0GHwzYzsWrI2kuZhgG5gpqRZo6jMpTTKiHDZety4LDoE61sGs1SpkQgV5Yq" +
    "0Lbm2SixcHBEJAcqS/A7/4u5IpwoSCOE4YaA"

  val cliBinaryL9: String =
    "QlpoOTFBWSZTWSFl2UIAAPJ/////////////////////////////////////////////4Ae+" +
    "te9qvt5277Vt2b3y+y+87e++3Pu599e+3e74hME02hNMjTZJphGExMmAQBkzQmTCaZlHoJpp" +
    "p6TQYjTCaMnohhMjRsjU0ybSYaJp6TEyZMRo9DSMm0T0Ix6ibTRkaPUD1ABplEgD0yjEyBmk" +
    "G0jR6RtT0jGnpTaBNMmhiNNqaNBtJiNM1Nk1NqBskeU0xPaiPSaaYmgeo0aA02kyb1NNMTSa" +
    "emp+oNJptNENqNPSBo0ZqZDMiITQ0ZMnqZPRqeU8pk0MnqMJoxNNNqZMm0anqD1PU02iDJ5J" +
    "mU0NMmymQyMaaj0ZT0MjQmGiY0EbSaGnpMjEyeKDTNT1D0T0RmoyNoTBiRhAQgzUMQfqGk9Q" +
    "NqbU9EaaD0mBM1NlDam1ND0mmm1H6p6ahhpPU2TUab0QnpoygG1HplGnqaMmho0yZqaMh6mg" +
    "09GmmoeoNqNA0MRmRqB6mRpp6MmkHUD1GhtNQ0GJ6mTQ2TUbSbQ1PJPU09DTTUeFPCaT1DyJ" +
    "6T1GnqHimjQemptTTQ8poempo9T1D1Gjyho0HqPU09T1D1PU9Mo00Mg0ZqBk00yB6nqGnqZB" +
    "6mTaRJibUaZPU/VPU9PTSm1D00aT00mI9NJ6j1MgZMg0PSNlGgPUeU/URtTTamg9Q2Uaeo9G" +
    "owhk9CaaA9TI9QaaD00j1PUYTTI0bUNMhp6nqemU2ptTym0jRtINAsT+fX0Jl35UyRKwo8+q" +
    "O9nv/ICb8MKPjmsepgiXLmwoo18Vq6Uf35GL2bURlIYS4FKfs92PfPrIotancOYNglJ6s63d" +
    "uO7FVrC2LL+lagw4lwoNNgk9ES/l+Ij5OG5zMvO1S23fxiDh48eKcjVakg2jDtLt1pjgmUKJ" +
    "BdDjHvVlGjoV/GPxRJ/4EEzMLV/nJ+Wm4zsrvpXSR47J/OEs8S1Ql9FI2zSz5yqSdgvW8IHM" +
    "4ruw73nbnSQS54rKdtGTsUNFodewWmZuHequBSB405MJvs5YWpBI16bIK5usM1vlfSEVxrRH" +
    "GfmkE1VLliY3Jya5EvASzQF++7pKKWahudasW1FgDWiSnUt3XuLvmJCyxVUpO7HOVGGbw66V" +
    "3+ajWaw5mJyUVTHdfksPxxkUB0pcBhX4SeWixI4NVinOL1DrvNmuin8PFLJNhlHKqKzRuJpD" +
    "Z9JvzsNQw1IieLkzN2y/aOeIVaisZoyBoz8OYOYLcGrOLxtCeRCsn2uMuMd9Ikwa3dFP6ED0" +
    "vRliHnIvKuW3R8h1IU5AMBjCF2WGsKgTCkEbUpLZc/m1n39SwGqJxn141PRpudy3taYv4gBN" +
    "bit3lnAgQbAPLyV9hFZMjARCE9L1yBRblPzHz13oX+7p8DPEJUS96nOr/1afDNkiGe+E+Js0" +
    "+GR2rsh1gVyXRdpKCeTEpX94xDKrZqccrl06iwuYdMxEZfVjZ20jKcgvA0SdEAHz7Kr5Axmj" +
    "4VAotFMxyJDXIIA6XT5iznRPWGqLGeCLC4mxo6SST8gLdsFbKHPnQqMcVt7ctMCNzAl5aEo2" +
    "Cj70PFGbGC7qh5ZSx4m1noN0cMKKsZfDG4EM99J9kRPce/I7akJjdeVYxs/mhb/OqfGZQPiE" +
    "8lASvWDP1ADcD6ZwFzwXc7lVfGzXolUYbsw9MTz6mOAgoXLLdoOg9DID1z1YHiLPmXpg/ak/" +
    "d3LHthVXYuLSSY3xJZILjlzSBmwYs37Vp4bmIUXIpjMGtKEbWoIGedw5oocAGA6anyzagM5m" +
    "4HyiZ9ajhKn/vRQIfR1S99+yl/rkCZUnUOcILj7jEHDUfaNYlg6tMt4zvJ7k912wJBg0VyQh" +
    "e9Tvhok/2w0vJTlUNiTk6Q0aBzUT4dD2rueJMHQLr4KQW1xBTLV9LGVrWqJtAFRJYriJnawC" +
    "tE2EGIBz8+Z34i/KUQmOVg+jIY59SfXSv7j21upO3cq2sFKca+mRUq3qFjiTip8RFhMsg4/t" +
    "swhhsjlV/gVpbCLSQ5oqc0lVQvbGpMQMYR4iTzQ7Zvg6U8Sh9BBVOUDwGoQpLmQvfDM/wExy" +
    "IM9qLGL5oxUO13iusQecYt7DVlADR1adC2WUl4RNiNlNaMpY45EDJC2kz1JykG1/uB9xhMiJ" +
    "urB6hQIujLPWipjDOwOex+R+vxJmTHpW9SJa8ayue8upt+Zb2YG8mtZugSuRka0A/zuEoB8H" +
    "2LXohmfVTSv7l1TA3porMV9FGsippZgJk29sVME+n5lWjDSMVSlqQi6JpiXhSUPwMn+tsJhI" +
    "DRNG3O7olGbNlHTrgBZak3umFePJmYVLbFWrls1EyCLrWNfM/GswIJ8rJoGolkc9+oTV6HFT" +
    "ECNzWdp24zUNY0/Qu3dpcPDWLPnPnlU3ZiiJUEM6mJjMyyCN1wofzOGsbFHDb3OCGUGooAiW" +
    "nxVMVIKDcc2sqRQszpoodLGrtDtI0NesXt/c3mXOXVBTWJ3YitKZm6wexBvHP+3zZwj2/tuG" +
    "yQIplb9mVYp1QnnE4xFra83aGhpiaqmygZ4zhcHBoggzuTySVYH0ypuuLmKi7vxitKp+rf6I" +
    "9Z3u/FvSB1Tu13t8P/XVWwPglWjiKrH9BLWELPcrauiwP6ZKUFmzUzQNo8xlMiXBtYmnjW1H" +
    "sh2C1mX5bZu9v1WYbyRZ8OqCREn87gUZC+FxS+fQQcSieIVZdqcIO8IBb6bu3qla41pQTE8m" +
    "DjEQmQaSYCxT+LnSXCQk0g/IwEI9H0nU64oOt1TytvjnhZVHZefAQwIUmVlTJrQvOuWCaQMm" +
    "7iM583w4w47A5NKbLhsBr2Dlckgxs72ituLIXNTlW5vfaQvAmm4TPXlCzFwhSVJY45YMi8cf" +
    "UCZHVS5mpMqZ0Kcv5hDV4FF9C4gCRuOvGJB8Bc2nnVuMu7Fk+wc2kgeLIKEkhWGCi/MrnsB3" +
    "K2V7211+9h1y1hKUaIBsUW1rghI/WZFWRetjjK1mZar9wO6vRfr88oVKJwx5ZSfiuokA3EkG" +
    "5qHMtATbqMj9nfZPi0N79ETsuCseiPZ204dO11QRmS14IvHjRocBMwc4XTnJzEsBJMS7ShBH" +
    "WfW7ju8E5zDNzq0WNtjKer1IDx/qGXOCclyLgovUZoFzZbJ+iau6FCRJ5XEPP6YKVwzW4d1t" +
    "TyYgyGXpq+MQZfHcX0yFJbr35Xtom0akYirp9kieHWZ+sZp1RaZlIQddCxoKjublk0xjVjNV" +
    "GboFFSKLUaNlBN0Q4BMYBjbbM8FZV27NA+AGBscR+eAEMjZcGUZ8TOrJyKVKTL+z4tnLSs8r" +
    "bTbfRvLGpN94h9b6AkbaL5rXWL8xK3sDr3zlNMPDtQHYq1+QTp28epdHtcLVF7BJfyvfGzVb" +
    "eooUFexmXOd8ZbxZtU/SWD1FqqGiMu81Txt5sQtYhUOpViUmveXFHARg467hNFDWns5RQT4y" +
    "G7D+dAPXAiDVovqzrNxxMdjNZGqlXWvEZtAe0n6cthJI6jJb813ianQ9K9VK/e0aO65ThYTa" +
    "o2BTRKfMkQLBdB0t5RIezAn7WpzwJmLtmBU0Zi/3TkufnW1X3qu+RpY6Ud1ys5lmOcbsftMh" +
    "FsxVW6z/WYWlZAXRKkBYeREOQkvIBbqLcnU9N0ORE2U2NKRn8Oti8/XT+kphfIA33UrXbpfN" +
    "SPYnnirTienHB2knWHSIg6YYaul2V4DVvb3jXNwGpuOjCYSwlyVwMbh7cdeUB8iHmGYOn+9w" +
    "tROQq58VdaqYHHoR4MLtDhmij08Fa23uFaiFdqcBRkNDkoBmA54GaGix4Y+auZAB3qLKL4NO" +
    "PwFjRGBLaFNvLXxYXTMqLiZRENGguUj16Ek32SBD4Z2fmBb6mLFKj8oLATishsqBSmyaE5PB" +
    "bfmPFGBejalTM1hDDR62yzSmJbSEqPcg3yNl9Hv79lzArVW1Tq8BzQRVZS+74rY7t2r04wrh" +
    "jcR2k7qzEcl4ILzXOSqfXtaemBrtcOoJ3+hvjHWlqYSuHP1i5Q8yYaGwXTC9i+mAM7axSFK7" +
    "ElLrtETsGDna15z2jDUz6RmQRSnkC25nCN666A8++ACXO8UfsrKdVrKokXvX4Qrokk5LpIMS" +
    "y2B4DK/xetnQ114V3zM+5eF1nyY2PYUvTDAS8OcEKjp4AIO2CFQmWqkMLeDsXEp1oq2iDjRe" +
    "Ty/m3Ak/vSxwiWHWg6puuAkb2G79SDIwiD6af3zl9ENCwUXPMcKmk4EuYDshoP6wCxrogJBm" +
    "iXPNxxhZFEFaDFHn6q4Kha/DGNk1BiWt4Y4RPUf68TFH3YGTVAEGrVxvZ/k3RpuVLWsMM61x" +
    "tDVujIerupagmm0CZEbUzT81vpJ4WvjZBD5xKMp3xzTsMbUBNmx5DljjIAqL3gad4xvfVYkp" +
    "JhN/zGUg1EUCS1Fjox0Cn+kua6Y4jeNMKWfSpxkkjvBE28IriTci7qMIjcgI17UBxxy0NxuD" +
    "kA+X8e83wyyO6iWsTSgVJs5lw/m9XSFIiSPLBdUfGTEKI3v1DhisgrWz+MpftR5RTqCwY4kf" +
    "c9TlH/HVh5Qh120hvq4FTQAGChvOXdG2hpMBXMPdMYJPtXG6TdIPjtjF2hCnI7N1OnY2UAWg" +
    "iMeAFoNl8lrZOI2YZIwTE23/8XckU4UJAhZdlCA="

  val cliEmpty: String =
    "QlpoMRdyRThQkAAAAAA="

  val cliMulti: String =
    "QlpoMTFBWSZTWVcwZvQAAc3RgAAQQAA////wQAJoDgAIp7QKekaGgAEVP2hoyqggYECjQ0AA" +
    "AAhVKPKfqEfpT1NGmI2Kd581LCy0Yg9jNDT1pkAGoRVVIJmMod2FInURhwwo6EB1bO3blVnQ" +
    "jic+HqYhiuvj2vOl3zMtQ0ryhAwKs07yOJXfhKKoBYb7sha1qR3tgiZNUFY2TNxndkkRmDp7" +
    "csJgq3uU1kueo3UMiWdirVmSNxiZqulxPXg3nAi7Va1JiK2UxfVlxrB7BUbQzRc2cIxKM5Mt" +
    "PiD1G+bs5CLrATQebTqEwypVG5obeHpisgS4rTdwWuyD05Hy0zFERNRQUG6vCJ2FPhU1RfkV" +
    "yr1UdAAyiSp2RJAOnJoqamooiaoJliwicgXID4VNgXrhAOiJlE8KOQXkC+wpu5ZomYIiqkim" +
    "KKMAPCJwrqi6AsiYFNPJBURJJNUETRRRNR9AvhE4QD4AeYAYVOgr3RdxTAL6guBTUANFHmqe" +
    "6idxXIAZdwqqgmipoqiqKqqHYRdVSRTyo+RTUANhBP5F2Rf8XckU4UJBXMGb0EJaaDkxQVkm" +
    "U1lHCcMNAAAjU4HsAEAgABA////wAIAACDAAtgYyYmmE0xMBNMBEwU9NQ0AAAAkUjJqaaYjR" +
    "pkZMI4RF7epCOOCFtcvaJOpGpNE2XeZGdiRGf6Fd4BA9Wi+Pegw0x8KnBShDFlS9IIdHjQZk" +
    "Qg9Bh8M2M7FqyNpLmYYBuYKakWaOozKU0yohw2XrcuCw6BOtbBrNUqZEIFeWKtC25tkosXBw" +
    "RCQHKkvwO/+LuSKcKEgjhOGGgA=="

}
